package graft.operators

import graft.model.{CocoClasses, EngineConfig}
import graft.streaming.{FrameGenerator, VideoPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The full video pipeline exposed as batch queries over the seeded
  * synthetic frame stream (the reference's de-facto harness is its mock
  * producer — SURVEY.md §5).
  *
  * Round 9: q20-q23 carry FULL DuckDB oracles. The stateful fold
  * (VideoPipeline.processFrames) is replayed relationally from a
  * parquet dump of the deterministic generated frames
  * ([[ensureFramesDump]]): the per-frame 32-bin byte histogram and
  * prev-frame similarity are pure window/join computations (prevSig
  * is updated EVERY frame, so it is exactly `lag(signature)`), and
  * the only genuinely sequential state — lastKeyFrameTime — resets at
  * every scene-change frame, so the keyframe set is "anchor + k·step"
  * within anchor intervals (step = ceil(5 s / frame interval); the
  * generator's cadence is uniform, ts = BASE + i·40 ms, which the
  * replay derives from the dumped timestamps). The q20 oracle further
  * replays the synthetic detector (DetectionKernels.syntheticDetect)
  * — wraparound 31·h+b rolling hash, per-k derived confidence/class/
  * box — in exact integer + float32 arithmetic (conf values verified
  * bit-equal across engines for all 75 possible mantissas). q21's
  * oracle further replays the segment bounds, payload byte sums, and
  * the OSS object-key formatting.
  *
  * 3 streams × 25 fps × 400 s = 30 000 frames → per stream: 2 full
  * 3-minute segments + keyframes from both rules.
  */
object Pipeline {

  private def events(s: org.apache.spark.sql.SparkSession) =
    VideoPipeline.process(
      FrameGenerator.framesDs(s, streams = 3, fps = 25, durationSec = 400),
      EngineConfig())

  /** Oracle-side dump of the generated frames (bytes as signed ints —
    * DuckDB replays both the unsigned histogram bins and the SIGNED
    * rolling detector hash from them). Content is a pure function of
    * the fixed generator parameters, so one dump per JVM suffices and
    * every SF sees identical frames. Published through [[OracleDump]]
    * (write-once, atomic rename) so a concurrent reader never sees a
    * half-written dir and the dump lands under Verify's outDir.
    */
  private val framesName = "graft_pipeline_frames.parquet"

  private def ensureFramesDump(s: SparkSession): Unit =
    OracleDump.ensure(framesName) { tmp =>
      import s.implicits._
      FrameGenerator.framesDs(s, streams = 3, fps = 25, durationSec = 400)
        .map(f => (f.streamId, f.frameId, f.frameSequence.toLong,
          f.timestamp, f.frameData.map(_.toInt).toSeq))
        .toDF("stream_id", "frame_id", "seq", "ts", "bytes")
        .coalesce(4)
        .write.parquet(tmp)
    }

  /** Shared relational replay of the VideoPipeline fold (SQL CTE
    * fragment; see class doc for the derivation):
    *   fr      — the dumped frames
    *   hb      — per-frame 32-bin histogram counts (bin = (b&0xff)>>3)
    *   scn     — scene-change frames: histogram-intersection
    *             similarity < 0.7. All frames carry 256 bytes, so
    *             similarity = sum_min/256 exactly (each k/256 and the
    *             32-term sum are exact doubles on the Spark side) and
    *             the test is the INTEGER cut sum_min <= 179
    *             (179/256 < 0.7 < 180/256).
    *   params  — per-stream seq range + uniform frame interval dt
    *   anchors — keyframe-clock resets: scene frames, plus the
    *             initial-state time-rule frame (first frame with
    *             ts - 0 >= 5000, valid while it precedes every scene)
    *   keys/kf — keyframes: anchor + k·ceil(5000/dt) within [a, next)
    *   segs    — segment flushes: buffer-extend-then-flush at
    *             ts - segStart >= 180000, restart at flush+1 → seqs
    *             s0 + sst, then stride sst + 1 (sst = ceil(180000/dt))
    */
  private lazy val frameFoldCtes: String =
    s"""fr AS (
       |  SELECT stream_id, frame_id, seq, ts, bytes
       |  FROM '${OracleDump.DirToken}/$framesName/*.parquet'),
       |hb AS (
       |  SELECT stream_id, seq, ((byte + 256) % 256) // 8 AS bin,
       |    count(*) AS c
       |  FROM (SELECT stream_id, seq, unnest(bytes) AS byte FROM fr)
       |  GROUP BY 1, 2, 3),
       |scn AS (
       |  SELECT c1.stream_id, c1.seq
       |  FROM hb c1 JOIN hb c0
       |    ON c0.stream_id = c1.stream_id AND c0.seq = c1.seq - 1
       |   AND c0.bin = c1.bin
       |  GROUP BY 1, 2
       |  HAVING sum(least(c1.c, c0.c)) <= 179),
       |params AS (
       |  SELECT stream_id, min(seq) AS s0, max(seq) AS smax,
       |    CAST(ceil(5000.0 * (max(seq) - min(seq))
       |      / (max(ts) - min(ts))) AS BIGINT) AS kst,
       |    CAST(ceil(180000.0 * (max(seq) - min(seq))
       |      / (max(ts) - min(ts))) AS BIGINT) AS sst
       |  FROM fr GROUP BY 1),
       |anchors AS (
       |  SELECT stream_id, seq FROM scn
       |  UNION
       |  SELECT f.stream_id, min(f.seq)
       |  FROM fr f LEFT JOIN (
       |    SELECT stream_id, min(seq) AS ms FROM scn GROUP BY 1) s
       |    USING (stream_id)
       |  WHERE f.ts >= 5000 AND (s.ms IS NULL OR f.seq < s.ms)
       |  GROUP BY 1),
       |aiv AS (
       |  SELECT stream_id, seq AS a,
       |    lead(seq) OVER (PARTITION BY stream_id ORDER BY seq) AS na
       |  FROM anchors),
       |keys AS (
       |  SELECT i.stream_id,
       |    unnest(generate_series(i.a, coalesce(i.na - 1, p.smax),
       |      p.kst)) AS seq
       |  FROM aiv i JOIN params p USING (stream_id)),
       |kf AS (SELECT f.* FROM fr f JOIN keys USING (stream_id, seq)),
       |segs AS (
       |  SELECT p.stream_id,
       |    unnest(generate_series(p.s0 + p.sst, p.smax, p.sst + 1))
       |      AS seq
       |  FROM params p)""".stripMargin

  /** Two's-complement int64 wraparound of a HUGEINT expression —
    * Java long arithmetic replayed in SQL.
    */
  private def wrap64(e: String): String =
    s"(($e) % 18446744073709551616 + 18446744073709551616" +
      s" + 9223372036854775808) % 18446744073709551616" +
      s" - 9223372036854775808"

  private lazy val cocoList: String =
    CocoClasses.names.map(n => s"'$n'").mkString("[", ", ", "]")

  val defs: Seq[QueryDef] = Seq(

    // ── Q20: the detection side-output, flattened Doris-row shape —
    // full oracle: keyframe selection from the fold replay, then the
    // synthetic detector (functions/DetectionKernels.syntheticDetect;
    // semantics mirror of processor/YOLODetector.java:234-275's
    // decode-threshold-scale chain over the absent model) re-derived
    // per keyframe: rolling 31·h+b wraparound hash over the frame
    // bytes, n = |h| % 4 detections, per-k confidence/class/box from
    // trunc-division integer arithmetic, conf >= 0.5 cut (m >= 25 —
    // the float32 boundary is exact), float32 output arithmetic.
    QueryDef("q20_pipeline_detections",
      (s, dir) => {
        ensureFramesDump(s)
        VideoPipeline.dorisRows(events(s))
          .orderBy(col("stream_id"), col("frame_id"), col("object_class"),
            col("confidence"))
      },
      Some(s"""WITH $frameFoldCtes,
              |hsh AS (
              |  SELECT stream_id, frame_id, ts,
              |    list_reduce(
              |      list_prepend(CAST(1125899906842597 AS HUGEINT),
              |        list_transform(bytes, b -> CAST(b AS HUGEINT))),
              |      (acc, b) -> ${wrap64("31 * acc + b")}) AS h
              |  FROM kf),
              |dk AS (
              |  SELECT stream_id, frame_id, ts, h,
              |    unnest(generate_series(1, CAST(abs(h) % 4 AS BIGINT)))
              |      AS k1
              |  FROM hsh WHERE abs(h) % 4 > 0),
              |dh AS (
              |  SELECT stream_id, frame_id, ts,
              |    abs(${wrap64("h * k1")}) AS a
              |  FROM dk),
              |dets AS (
              |  SELECT stream_id, frame_id, ts,
              |    CAST(a % 75 AS BIGINT) AS m,
              |    CAST((a // 7) % 80 AS BIGINT) AS ci,
              |    CAST((a // 11) % 1856 AS BIGINT) AS xi,
              |    CAST((a // 13) % 1016 AS BIGINT) AS yi
              |  FROM dh WHERE a % 75 >= 25)
              |SELECT stream_id,
              |  strftime(make_timestamp(ts * 1000),
              |    '%Y-%m-%d %H:%M:%S') AS detection_time,
              |  frame_id,
              |  ($cocoList)[ci + 1] AS object_class,
              |  CAST(0.25 AS REAL) + CAST(m AS REAL) / CAST(100 AS REAL)
              |    AS confidence,
              |  CAST(xi AS REAL) AS bbox_x1, CAST(yi AS REAL) AS bbox_y1,
              |  CAST(xi + 64 AS REAL) AS bbox_x2,
              |  CAST(yi + 48 AS REAL) AS bbox_y2,
              |  '' AS frame_url
              |FROM dets
              |ORDER BY stream_id, frame_id, object_class, confidence"""
        .stripMargin)),

    // ── Q21: the segment side-output (OSS object-key scheme,
    // sink/OSSVideoSink.java:48-57) — full oracle: segment bounds
    // from the flush replay (start = previous flush + 1, else the
    // stream's first frame; the flushed segment INCLUDES the trigger
    // frame), byte sizes summed from the dumped frame payloads, and
    // the videos/{stream}/{yyyyMMdd/HH}/{stream}_{start}.mp4 key
    // formatted from the segment start in UTC.
    QueryDef("q21_pipeline_segments",
      (s, dir) => {
        ensureFramesDump(s)
        VideoPipeline.segmentRows(events(s))
          .orderBy(col("stream_id"), col("start_time"))
      },
      Some(s"""WITH $frameFoldCtes,
              |segb AS (
              |  SELECT g.stream_id, g.seq AS fseq,
              |    coalesce(lag(g.seq) OVER (PARTITION BY g.stream_id
              |      ORDER BY g.seq) + 1, p.s0) AS sseq
              |  FROM segs g JOIN params p USING (stream_id))
              |SELECT b.stream_id, fs.ts AS start_time, fe.ts AS end_time,
              |  'videos/' || b.stream_id || '/'
              |    || strftime(make_timestamp(fs.ts * 1000), '%Y%m%d/%H')
              |    || '/' || b.stream_id || '_' || fs.ts || '.mp4' AS path,
              |  CAST(b.fseq - b.sseq + 1 AS INT) AS frame_count,
              |  CAST((SELECT sum(len(x.bytes)) FROM fr x
              |   WHERE x.stream_id = b.stream_id
              |     AND x.seq BETWEEN b.sseq AND b.fseq) AS BIGINT)
              |    AS file_size,
              |  fe.ts - fs.ts AS duration_ms
              |FROM segb b
              |JOIN fr fs ON fs.stream_id = b.stream_id AND fs.seq = b.sseq
              |JOIN fr fe ON fe.stream_id = b.stream_id AND fe.seq = b.fseq
              |ORDER BY b.stream_id, start_time""".stripMargin)),

    // ── Q22: event inventory per (stream, kind) — full oracle:
    // detections = the keyframe set, segments = the flush set, both
    // from the shared fold replay.
    QueryDef("q22_pipeline_stats",
      (s, dir) => {
        ensureFramesDump(s)
        events(s).toDF()
          .groupBy(col("streamId").as("stream_id"), col("kind"))
          .agg(count(lit(1)).as("n"),
            min(col("timestamp")).as("min_ts"),
            max(col("timestamp")).as("max_ts"))
          .orderBy(col("stream_id"), col("kind"))
      },
      Some(s"""WITH $frameFoldCtes,
              |ev AS (
              |  SELECT stream_id, 'detection' AS kind, ts FROM kf
              |  UNION ALL
              |  SELECT f.stream_id, 'segment' AS kind, f.ts
              |  FROM fr f JOIN segs g USING (stream_id, seq))
              |SELECT stream_id, kind, count(*) AS n,
              |  min(ts) AS min_ts, max(ts) AS max_ts
              |FROM ev GROUP BY 1, 2
              |ORDER BY stream_id, kind""".stripMargin)),

    // ── Q23: keyframe-extraction rate per stream — the reference's
    // runtime counters (totalFramesProcessed / keyFramesExtracted
    // ratio, function/VideoProcessFunction.java:49-51,133-138) as a
    // relational metric — full oracle from the fold replay. The
    // round-to-6 is boundary-safe: key_frames/total has at most
    // ceil(log10(total)) < 6 significant decimals of true value
    // distance from any half boundary at these totals.
    QueryDef("q23_pipeline_rates",
      (s, dir) => {
        ensureFramesDump(s)
        val frames = FrameGenerator
          .framesDs(s, streams = 3, fps = 25, durationSec = 400).toDF()
          .groupBy(col("streamId").as("stream_id"))
          .agg(count(lit(1)).as("total_frames"))
        val keys = events(s).toDF()
          .filter(col("kind") === "detection")
          .groupBy(col("streamId").as("stream_id"))
          .agg(count(lit(1)).as("key_frames"))
        frames.join(keys, "stream_id")
          .select(col("stream_id"), col("total_frames"), col("key_frames"),
            round(col("key_frames").cast("double") / col("total_frames"), 6)
              .as("keyframe_rate"))
          .orderBy(col("stream_id"))
      },
      Some(s"""WITH $frameFoldCtes,
              |tot AS (
              |  SELECT stream_id, count(*) AS total_frames
              |  FROM fr GROUP BY 1),
              |kn AS (
              |  SELECT stream_id, count(*) AS key_frames
              |  FROM kf GROUP BY 1)
              |SELECT t.stream_id, t.total_frames, k.key_frames,
              |  round(CAST(k.key_frames AS DOUBLE) / t.total_frames, 6)
              |    AS keyframe_rate
              |FROM tot t JOIN kn k USING (stream_id)
              |ORDER BY stream_id""".stripMargin)))
}
