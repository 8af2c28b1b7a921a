package graft.operators

import graft.model.VideoFrame
import graft.streaming.FrameGenerator
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise.
  *
  * The actual codec work (JPEG decode, resample, frame extraction) is
  * STUBBED behind deterministic byte-level stand-ins — no image/audio
  * libraries exist in this container — but the Spark-side plumbing is
  * real and tested: schema (binary + metadata struct), partition-count
  * control for memory-bounded decode batches, mapPartitions batching
  * (the JVM analog of mapInPandas: amortize per-batch library init
  * across rows, never per-row), and feature-struct output schema.
  *
  * Scale notes: binary payloads dominate row size, so the decode stage
  * repartitions by target partition bytes BEFORE the heavy map (at
  * 100 TB the input split sizing, not the compute, decides whether
  * executors OOM); extracted features are small and flow into ordinary
  * relational ops afterwards.
  */
object Multimodal {

  final case class MediaFeatures(
      mean_byte: Double,
      entropy: Double,
      dominant_bin: Int,
      size_bytes: Long)

  final case class MediaRow(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      codec: String)

  /** Synthetic media table (seeded — FrameGenerator payloads). */
  def mediaTable(s: SparkSession, n: Int = 1000): Dataset[MediaRow] = {
    import s.implicits._
    s.range(0, n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaRow(id, kind,
        FrameGenerator.frameBytes(id * 31L + 7L, (id % 5).toInt, 512),
        1920, 1080, if (kind == "image") "jpeg" else "h264")
    }
  }

  /** STUB decode: deterministic byte statistics standing in for a real
    * decoder. Batched via mapPartitions so a real codec would pay
    * library init once per partition, not per row.
    */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real impl: initialize decoder/session HERE, once per partition)
      it.map { m =>
        val bytes = m.payload
        val hist = new Array[Long](32)
        var sum = 0.0
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b >> 3) += 1
          sum += b
          i += 1
        }
        var entropy = 0.0
        var dominant = 0
        var j = 0
        while (j < 32) {
          if (hist(j) > hist(dominant)) dominant = j
          if (hist(j) > 0) {
            val p = hist(j).toDouble / bytes.length
            entropy -= p * math.log(p) / math.log(2)
          }
          j += 1
        }
        (m.media_id, m.kind,
          MediaFeatures(sum / bytes.length, entropy, dominant,
            bytes.length.toLong))
      }
    }.toDF("media_id", "kind", "features")
  }

  /** STUB resize: deterministic payload decimation to a target "pixel"
    * budget — keeps every ceil(len/target)-th byte so output size ≤
    * target (stands in for a real thumbnailer; the 1→1 binary map with
    * updated dimension metadata is the real contract). Batched via
    * mapPartitions like extractFeatures: a real codec initializes once
    * per partition, processes whole batches, and must bound PEAK
    * memory by input-split sizing, not row count.
    */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int = 64,
      targetW: Int = 320, targetH: Int = 180): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val in = m.payload
        val stride = math.max(1, (in.length + targetBytes - 1) / targetBytes)
        val out = new Array[Byte]((in.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = in(i * stride); i += 1 }
        m.copy(payload = out, width = targetW, height = targetH)
      }
    }
  }

  /** Histogram aHash over a payload — q158's decode-stage kernel.
    * 64-bin byte histogram (4 byte-values per bin); bit i = 1 iff
    * bin i holds strictly more than 1/64 of the bytes (the aHash
    * above-mean rule applied to the histogram). Packed as FOUR
    * 16-bit band ints (b0 = bins 0–15 … b3 = bins 48–63) — the band
    * decomposition IS the near-join index (pigeonhole: two hashes ≤ 3
    * bits apart agree on ≥ 1 whole band), and 4 non-negative ints
    * sidestep the bit-63 sign trap a single packed i64 would carry
    * across engines. Batched via mapPartitions like extractFeatures:
    * a real perceptual hash (DCT over decoded pixels) initializes its
    * codec once per partition and emits the same (id, 4×i16) shape.
    */
  def phashBands(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        val hist = new Array[Int](64)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 2) += 1; i += 1 }
        val b = new Array[Int](4)
        var j = 0
        while (j < 64) {
          if (hist(j).toLong * 64 > bytes.length) b(j >> 4) |= 1 << (j & 15)
          j += 1
        }
        (m.media_id, m.kind, b(0), b(1), b(2), b(3))
      }
    }.toDF("media_id", "kind", "b0", "b1", "b2", "b3")
  }

  /** Hot-band cap for [[phashClusters]]: a 16-bit band VALUE shared
    * by more distinct signatures than this is a degenerate band (the
    * all-dark / all-saturated histogram region every corpus
    * over-produces) — joining through it is quadratic in its bucket
    * size, the same blow-up the q42 LSH bucket cap and q99 anchor cap
    * exist to stop. Dropping it trades away ONLY pairs whose sole
    * identical band is that degenerate value (they still differ in
    * all three informative bands) — the standard LSH df-cap recall
    * trade, taken deliberately and spec-pinned. 4096 distinct sigs
    * per band value is far above anything the test corpus produces
    * (results here are cap-free-identical) and bounds candidates at
    * 4096 · |band rows| — linear — at any corpus size.
    */
  private[graft] val PhashMaxBucket = 4096

  /** q158's census over a (media_id, kind, b0..b3) signature frame
    * (the [[phashBands]] output, localCheckpoint-ed or persisted by
    * the caller — two consumers sit across the broadcast gate's
    * measuring counts). Exact-hash grouping first, banded near-join
    * over the DISTINCT signature set only (pigeonhole: hamming ≤ 3 ⇒
    * ≥ 1 identical 16-bit band, so the candidate set provably
    * contains every pair under the radius — less the documented
    * [[PhashMaxBucket]] hot-band trade), bit_count verify,
    * connectedComponents over the verified sig graph, and the
    * cluster-map back-join through the measured broadcast gate — the
    * media table never shuffles for it.
    */
  private[graft] def phashClusters(sigs: DataFrame,
      maxBucket: Int = PhashMaxBucket): DataFrame = {
    graft.plans.GraftFunctions.ensure(sigs.sparkSession)
    val sidCol = call_function("graft_hash64",
      concat_ws("-", col("b0").cast("string"), col("b1").cast("string"),
        col("b2").cast("string"), col("b3").cast("string")))
    val ds = sigs.groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(count(lit(1)).as("nm"))
      .withColumn("sid", sidCol)
    // cached: the band explosion feeds BOTH the hot-bucket agg and
    // the anti-join probe side (the q99 container pattern)
    val bandRows = ds.select(col("sid"), col("b0"), col("b1"), col("b2"),
      col("b3"), posexplode(array(col("b0"), col("b1"), col("b2"),
        col("b3"))).as(Seq("bi", "v")))
      .transform(graft.plans.CacheLifecycle.autoRelease)
    val hot = bandRows.groupBy(col("bi"), col("v"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).select(col("bi"), col("v"))
    val bx = bandRows.join(broadcast(hot), Seq("bi", "v"), "left_anti")
    val xa = bx.select(col("bi"), col("v"), col("sid").as("sid_a"),
      col("b0").as("xb0"), col("b1").as("xb1"),
      col("b2").as("xb2"), col("b3").as("xb3"))
    val xb = bx.select(col("bi"), col("v"), col("sid").as("sid_b"),
      col("b0").as("yb0"), col("b1").as("yb1"),
      col("b2").as("yb2"), col("b3").as("yb3"))
    val vp = xa.join(xb, Seq("bi", "v"))
      .filter(col("sid_a") < col("sid_b"))
      .select(col("sid_a"), col("sid_b"), col("xb0"), col("xb1"),
        col("xb2"), col("xb3"), col("yb0"), col("yb1"), col("yb2"),
        col("yb3"))
      .distinct()
      .filter(expr("bit_count(xb0 ^ yb0) + bit_count(xb1 ^ yb1)"
        + " + bit_count(xb2 ^ yb2) + bit_count(xb3 ^ yb3) <= 3"))
      .select(col("sid_a").as("doc_a"), col("sid_b").as("doc_b"))
    val comp = Dedup.connectedComponents(vp)
    val cm = ds
      // comp is already localCheckpoint-ed inside CC → measure in
      // place; cm itself is distinct-sig-bounded → measured gate
      .join(Dedup.gatedBroadcast(comp, materialize = false),
        col("sid") === col("id"), "left")
      .select(col("b0"), col("b1"), col("b2"), col("b3"), col("sid"),
        coalesce(col("lbl"), col("sid")).as("cl"))
    sigs.join(Dedup.gatedBroadcast(cm), Seq("b0", "b1", "b2", "b3"))
      .groupBy(col("cl"))
      .agg(min(col("media_id")).as("cluster_rep"),
        count(lit(1)).as("n_media"),
        countDistinct(col("sid")).as("n_sigs"),
        countDistinct(col("kind")).as("n_kinds"))
      .select(col("cluster_rep"), col("n_media"), col("n_sigs"),
        col("n_kinds"))
      .orderBy(col("n_media").desc, col("cluster_rep"))
  }

  /** STUB frame sampling: every `stride`-th 64-byte block of a video
    * payload as one "frame" (stands in for I-frame extraction; the
    * 1→N row shape and array<binary> schema are the real contract).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"filter(transform(sequence(0, int(length(payload)/64) - 1), " +
            s"i -> substring(payload, i*64 + 1, 64)), " +
            s"(x, i) -> i % $stride = 0)")).as(Seq("frame_idx", "frame_bytes")))

  /** Oracle-side dump of the synthetic media table (payload bytes as
    * signed ints, once per JVM — the q20 frames-dump pattern): the
    * stub "decode" steps are deterministic byte arithmetic, so DuckDB
    * can replay features / frame sampling / resize sizing exactly and
    * the three media queries carry full oracles instead of digests.
    */
  private val mediaName = "graft_media.parquet"

  private def ensureMediaDump(s: SparkSession): Unit =
    OracleDump.ensure(mediaName) { tmp =>
      import s.implicits._
      mediaTable(s)
        .map(m => (m.media_id, m.kind, m.payload.map(_.toInt).toSeq))
        .toDF("media_id", "kind", "bytes")
        .coalesce(2)
        .write.parquet(tmp)
    }

  private lazy val mediaCte: String =
    s"""md AS (SELECT media_id, kind, bytes
       |  FROM '${OracleDump.DirToken}/$mediaName/*.parquet')""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ── Q60: stub feature extraction — full oracle: unsigned-byte
    // mean (integer sum, one exact double division), 32-bin histogram
    // entropy (p = c/n exact doubles; the ln-based terms agree far
    // below the comparator's 9 significant digits, and the media
    // table is FIXED data, so a green compare is deterministic), and
    // dominant bin with the fold's first-wins tie rule (strict > ⇒
    // lowest bin wins ⇒ ORDER BY c DESC, bin).
    QueryDef("q60_media_features",
      (s, dir) => {
        ensureMediaDump(s)
        extractFeatures(mediaTable(s))
          .select(col("media_id"), col("kind"),
            col("features.mean_byte").as("mean_byte"),
            col("features.entropy").as("entropy"),
            col("features.dominant_bin").as("dominant_bin"),
            col("features.size_bytes").as("size_bytes"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH $mediaCte,
              |ub AS (
              |  SELECT media_id, kind, (b + 256) % 256 AS b
              |  FROM (SELECT media_id, kind, unnest(bytes) AS b FROM md)),
              |ag AS (
              |  SELECT media_id, kind, count(*) AS n, sum(b) AS s
              |  FROM ub GROUP BY 1, 2),
              |hb AS (
              |  SELECT media_id, b // 8 AS bin, count(*) AS c
              |  FROM ub GROUP BY 1, 2),
              |dom AS (
              |  SELECT media_id, bin FROM (
              |    SELECT media_id, bin, row_number() OVER (
              |      PARTITION BY media_id ORDER BY c DESC, bin) AS rn
              |    FROM hb)
              |  WHERE rn = 1),
              |ent AS (
              |  SELECT h.media_id,
              |    -sum((CAST(h.c AS DOUBLE) / a.n)
              |      * ln(CAST(h.c AS DOUBLE) / a.n) / ln(2)) AS entropy
              |  FROM hb h JOIN ag a USING (media_id)
              |  GROUP BY h.media_id)
              |SELECT a.media_id, a.kind,
              |  CAST(a.s AS DOUBLE) / a.n AS mean_byte,
              |  e.entropy,
              |  CAST(d.bin AS INT) AS dominant_bin,
              |  CAST(a.n AS BIGINT) AS size_bytes
              |FROM ag a JOIN dom d USING (media_id)
              |JOIN ent e USING (media_id)
              |ORDER BY a.media_id""".stripMargin)),

    // ── Q61: stub I-frame sampling — full oracle: every 4th 64-byte
    // block of each video payload; counts and byte sums are pure
    // integer arithmetic over the payload length.
    QueryDef("q61_media_frame_sample",
      (s, dir) => {
        ensureMediaDump(s)
        sampleFrames(mediaTable(s))
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame_bytes"))).as("sampled_bytes"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH $mediaCte
              |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
              |  CAST(sum(least(64, n - i * 64)) AS BIGINT)
              |    AS sampled_bytes
              |FROM (
              |  SELECT media_id, len(bytes) AS n,
              |    unnest(generate_series(0, len(bytes) // 64 - 1, 4))
              |      AS i
              |  FROM md WHERE kind = 'video')
              |GROUP BY media_id ORDER BY media_id""".stripMargin)),

    // ── Q153: CROSS-MODAL COVERAGE — the multimodal sample-assembly
    // audit: join the text corpus to the media table by id
    // (media_id ≡ doc_id for the paired subset) and report, per
    // (source, kind), how many documents have a media twin, the
    // paired payload bytes, and coverage vs the source's doc count in
    // half-up ppm. This is the first number a multimodal training
    // recipe needs — how much of each text source can actually be
    // assembled into (text, image/audio/video) pairs.
    //
    // Scale shape: HERE the media table is dimension-sized, so both
    // joins broadcast and the corpus pays two cheap 2-column scans
    // (pairing + per-source totals). At a deployment where media is
    // corpus-scale, the pairing join becomes a co-partitioned equi-
    // join (both sides bucketed by id — the storage layout q135's
    // z-order study argues for); the report stays bounded by
    // |sources| × |kinds|. Oracle replays the pairing from the media
    // dump, so the binary-side byte accounting is checked end to end.
    QueryDef("q153_crossmodal_coverage",
      (s, dir) => {
        ensureMediaDump(s)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
        val media = mediaTable(s).toDF()
          .select(col("media_id"), col("kind"),
            length(col("payload")).cast("long").as("nbytes"))
        val tot = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        docs.join(broadcast(media), col("doc_id") === col("media_id"))
          .groupBy(col("source"), col("kind"))
          .agg(count(lit(1)).as("n_paired"),
            sum(col("nbytes")).as("paired_bytes"))
          .join(broadcast(tot), "source")
          .select(col("source"), col("kind"), col("n_docs"),
            col("n_paired"), col("paired_bytes"),
            expr("(2 * n_paired * 1000000 + n_docs) div (2 * n_docs)")
              .as("coverage_ppm"))
          .orderBy(col("source"), col("kind"))
      },
      Some(s"""WITH $mediaCte,
              |mb AS (
              |  SELECT media_id, kind, len(bytes) AS nbytes FROM md),
              |tot AS (
              |  SELECT source, count(*) AS n_docs
              |  FROM documents GROUP BY source),
              |pr AS (
              |  SELECT d.source, m.kind, count(*) AS n_paired,
              |    sum(m.nbytes) AS paired_bytes
              |  FROM documents d JOIN mb m ON m.media_id = d.doc_id
              |  GROUP BY 1, 2)
              |SELECT p.source, p.kind, CAST(t.n_docs AS BIGINT) AS n_docs,
              |  CAST(p.n_paired AS BIGINT) AS n_paired,
              |  CAST(p.paired_bytes AS BIGINT) AS paired_bytes,
              |  CAST((2 * p.n_paired * 1000000 + t.n_docs)
              |    // (2 * t.n_docs) AS BIGINT) AS coverage_ppm
              |FROM pr p JOIN tot t USING (source)
              |ORDER BY p.source, p.kind""".stripMargin)),

    // ── Q62: stub thumbnailer — full oracle: output size is
    // ceil(len / ceil(len/64)) with the metadata dims rewritten.
    QueryDef("q62_media_resize",
      (s, dir) => {
        ensureMediaDump(s)
        resizeStub(mediaTable(s)).toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            length(col("payload")).cast("long").as("thumb_bytes"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH $mediaCte
              |SELECT media_id, kind,
              |  CAST(320 AS INT) AS width, CAST(180 AS INT) AS height,
              |  CAST((n + st - 1) // st AS BIGINT) AS thumb_bytes
              |FROM (
              |  SELECT media_id, kind, len(bytes) AS n,
              |    greatest(1, (len(bytes) + 63) // 64) AS st
              |  FROM md)
              |ORDER BY media_id""".stripMargin)),

    // ── Q158: MEDIA PERCEPTUAL-HASH NEAR-DUP — image/media dedup as
    // production multimodal pipelines run it: exact-hash grouping
    // FIRST (identical perceptual hashes collapse before any join),
    // then a banded near-join over the DISTINCT hash set only, then
    // component merge — so the expensive quadratic step never sees
    // the corpus, only its distinct-signature projection. Pipeline:
    // [[phashBands]] per payload (the decode-stage kernel) → group by
    // the 4-band signature (distinct sigs are a corpus FRACTION —
    // every exact re-encode/re-crawl collapses here) → explode 4
    // (band, value) keys per distinct sig and self-join (pigeonhole:
    // hamming ≤ 3 ⇒ ≥ 1 identical 16-bit band, so the candidate set
    // provably contains every pair under the radius) → verify
    // bit_count(xor) over the 4 bands ≤ 3 → connectedComponents over
    // the verified sig graph → per-cluster census: representative
    // (min media_id), media count, distinct signatures, distinct
    // kinds. The synthetic payloads carry 5 scene classes with
    // shifted byte histograms, so the clusters are real, not empty.
    //
    // 100 TB shape: the slim (id, kind, 4×i16) signature projection
    // is what a production ingest writes as a column (the q145-store
    // pattern) — here localCheckpoint stands in for that asset; the
    // band self-join and CC run on DISTINCT signatures (dimension-
    // like vs the corpus); the cluster map joins back through the
    // measured broadcast gate, so the media table never shuffles for
    // it. Sig ids are graft_hash64 of the band tuple — collisions are
    // negligible and BOTH engines replay the same hash, so parity is
    // deterministic; cluster identity is exposed via min(media_id),
    // never the label value (signed-vs-unsigned min order differs
    // across engines; grouping is order-agnostic).
    QueryDef("q158_media_phash_dedup",
      (s, dir) => {
        ensureMediaDump(s)
        // production: a persisted ingest-time column; here: one slim
        // checkpoint (two consumers sit across the gate's measuring
        // counts — the q152 pairs rationale)
        phashClusters(phashBands(mediaTable(s)).localCheckpoint())
      },
      Some(s"""WITH RECURSIVE $mediaCte,
              |ub AS (
              |  SELECT media_id, kind, (b + 256) % 256 AS b
              |  FROM (SELECT media_id, kind, unnest(bytes) AS b FROM md)),
              |nn AS (SELECT media_id, count(*) AS n FROM ub GROUP BY 1),
              |hb AS (
              |  SELECT media_id, b // 4 AS bin, count(*) AS c
              |  FROM ub GROUP BY 1, 2),
              |bits AS (
              |  SELECT h.media_id, h.bin FROM hb h JOIN nn USING (media_id)
              |  WHERE h.c * 64 > nn.n),
              |bnd AS (
              |  SELECT media_id, bin // 16 AS bi, sum(1 << (bin % 16)) AS v
              |  FROM bits GROUP BY 1, 2),
              |sig AS (
              |  SELECT m.media_id, m.kind,
              |    coalesce(max(CASE WHEN bi = 0 THEN v END), 0) AS b0,
              |    coalesce(max(CASE WHEN bi = 1 THEN v END), 0) AS b1,
              |    coalesce(max(CASE WHEN bi = 2 THEN v END), 0) AS b2,
              |    coalesce(max(CASE WHEN bi = 3 THEN v END), 0) AS b3
              |  FROM md m LEFT JOIN bnd b ON b.media_id = m.media_id
              |  GROUP BY 1, 2),
              |dsx AS (
              |  SELECT b0, b1, b2, b3,
              |    ${OracleSql.hash64("CAST(b0 AS VARCHAR) || '-' ||"
                 + " CAST(b1 AS VARCHAR) || '-' || CAST(b2 AS VARCHAR)"
                 + " || '-' || CAST(b3 AS VARCHAR)")} AS sid
              |  FROM (SELECT DISTINCT b0, b1, b2, b3 FROM sig)),
              |bandx AS (
              |  SELECT sid, b0, b1, b2, b3, 0 AS bi, b0 AS v FROM dsx
              |  UNION ALL SELECT sid, b0, b1, b2, b3, 1, b1 FROM dsx
              |  UNION ALL SELECT sid, b0, b1, b2, b3, 2, b2 FROM dsx
              |  UNION ALL SELECT sid, b0, b1, b2, b3, 3, b3 FROM dsx),
              |hotb AS (
              |  SELECT bi, v FROM bandx GROUP BY bi, v
              |  HAVING count(*) > $PhashMaxBucket),
              |coldx AS (
              |  SELECT * FROM bandx bb WHERE NOT EXISTS (
              |    SELECT 1 FROM hotb h WHERE h.bi = bb.bi AND h.v = bb.v)),
              |vp AS (
              |  SELECT a, b FROM (
              |    SELECT DISTINCT x.sid AS a, y.sid AS b,
              |      x.b0 AS xb0, x.b1 AS xb1, x.b2 AS xb2, x.b3 AS xb3,
              |      y.b0 AS yb0, y.b1 AS yb1, y.b2 AS yb2, y.b3 AS yb3
              |    FROM coldx x JOIN coldx y
              |      ON x.bi = y.bi AND x.v = y.v AND x.sid < y.sid)
              |  WHERE bit_count(xor(xb0, yb0)) + bit_count(xor(xb1, yb1))
              |      + bit_count(xor(xb2, yb2)) + bit_count(xor(xb3, yb3))
              |      <= 3),
              |edges AS (
              |  SELECT a, b FROM vp UNION ALL SELECT b, a FROM vp),
              |reach(src, dst) AS (
              |  SELECT DISTINCT a AS src, a AS dst FROM edges
              |  UNION
              |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
              |compx AS (
              |  SELECT src AS id, min(dst) AS lbl FROM reach GROUP BY src),
              |cm AS (
              |  SELECT d.b0, d.b1, d.b2, d.b3, d.sid,
              |    coalesce(c.lbl, d.sid) AS cl
              |  FROM dsx d LEFT JOIN compx c ON c.id = d.sid),
              |mm AS (
              |  SELECT s.media_id, s.kind, m.sid, m.cl
              |  FROM sig s JOIN cm m USING (b0, b1, b2, b3))
              |SELECT CAST(min(media_id) AS BIGINT) AS cluster_rep,
              |  CAST(count(*) AS BIGINT) AS n_media,
              |  CAST(count(DISTINCT sid) AS BIGINT) AS n_sigs,
              |  CAST(count(DISTINCT kind) AS BIGINT) AS n_kinds
              |FROM mm GROUP BY cl
              |ORDER BY n_media DESC, cluster_rep""".stripMargin)),

    // ── Q159: CROSS-MODAL DEDUP CONSISTENCY — the audit a multimodal
    // curation pipeline runs between its two dedup signals: of the
    // TEXT near-dup pairs (the q145 3-signal graph), how many have
    // media twins on both endpoints, and of those, how many ALSO
    // agree under the q158 perceptual hash (hamming ≤ 3)? A low
    // agreement ppm flags copied captions on unrelated media (or
    // re-encoded media with rewritten text) — the mislabeled-pair
    // classes LAION-style (text, image) dedup audits exist to catch.
    // One row: pair counts for each stage, phash-match ppm (half-up),
    // and the exact hamming mass over the paired subset.
    //
    // 100 TB shape: the pair list is graph-bounded (the q145 store in
    // production — here one mining pass); the media signature table
    // is dimension-sized HERE so both endpoint joins broadcast it
    // (LEFT, so pairs without media twins stay countable) — at
    // media-at-corpus-scale deployments they become the
    // co-partitioned id-keyed equi-joins documented at q153, and the
    // census stays one row. All arithmetic is integer (bit_count /
    // cross-multiplied ppm), so parity is engine-exact.
    QueryDef("q159_crossmodal_dedup_consistency",
      (s, dir) => {
        ensureMediaDump(s)
        val pairs = Dedup.multiSignalPairsFrom(
          Tables.documents(s, dir).select(col("doc_id"), col("text")))
        val sigs = phashBands(mediaTable(s))
        val sa = sigs.select(col("media_id").as("doc_a"),
          col("b0").as("a0"), col("b1").as("a1"),
          col("b2").as("a2"), col("b3").as("a3"))
        val sb = sigs.select(col("media_id").as("doc_b"),
          col("b0").as("c0"), col("b1").as("c1"),
          col("b2").as("c2"), col("b3").as("c3"))
        pairs
          .join(broadcast(sa), Seq("doc_a"), "left")
          .join(broadcast(sb), Seq("doc_b"), "left")
          .withColumn("both",
            when(col("a0").isNotNull && col("c0").isNotNull, 1L)
              .otherwise(0L))
          .withColumn("ham",
            when(col("both") === 1L,
              expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1)"
                + " + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
                .cast("long")))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("both")).as("n_with_media"),
            sum(when(col("both") === 1L && col("ham") <= 3L, 1L)
              .otherwise(0L)).as("n_phash_match"),
            sum(when(col("both") === 1L, col("ham")).otherwise(0L))
              .as("sum_hamming"))
          .select(col("n_pairs"), col("n_with_media"),
            col("n_phash_match"), col("sum_hamming"),
            expr("CAST(CASE WHEN n_with_media = 0 THEN 0"
              + " ELSE (2 * n_phash_match * 1000000 + n_with_media)"
              + " div (2 * n_with_media) END AS BIGINT)")
              .as("match_ppm"))
      },
      Some(s"""WITH ${Dedup.storePairsCtes},
              |$mediaCte,
              |ub AS (
              |  SELECT media_id, kind, (b + 256) % 256 AS b
              |  FROM (SELECT media_id, kind, unnest(bytes) AS b FROM md)),
              |nn AS (SELECT media_id, count(*) AS n FROM ub GROUP BY 1),
              |hb AS (
              |  SELECT media_id, b // 4 AS bin, count(*) AS c
              |  FROM ub GROUP BY 1, 2),
              |bits AS (
              |  SELECT h.media_id, h.bin FROM hb h JOIN nn USING (media_id)
              |  WHERE h.c * 64 > nn.n),
              |bnd AS (
              |  SELECT media_id, bin // 16 AS bi, sum(1 << (bin % 16)) AS v
              |  FROM bits GROUP BY 1, 2),
              |sig AS (
              |  SELECT m.media_id,
              |    coalesce(max(CASE WHEN bi = 0 THEN v END), 0) AS b0,
              |    coalesce(max(CASE WHEN bi = 1 THEN v END), 0) AS b1,
              |    coalesce(max(CASE WHEN bi = 2 THEN v END), 0) AS b2,
              |    coalesce(max(CASE WHEN bi = 3 THEN v END), 0) AS b3
              |  FROM md m LEFT JOIN bnd b ON b.media_id = m.media_id
              |  GROUP BY 1),
              |j AS (
              |  SELECT p.doc_a, p.doc_b,
              |    CASE WHEN a.media_id IS NOT NULL
              |          AND b.media_id IS NOT NULL THEN 1 ELSE 0 END AS bo,
              |    CASE WHEN a.media_id IS NOT NULL
              |          AND b.media_id IS NOT NULL
              |         THEN bit_count(xor(a.b0, b.b0))
              |            + bit_count(xor(a.b1, b.b1))
              |            + bit_count(xor(a.b2, b.b2))
              |            + bit_count(xor(a.b3, b.b3)) END AS ham
              |  FROM pairs p
              |  LEFT JOIN sig a ON a.media_id = p.doc_a
              |  LEFT JOIN sig b ON b.media_id = p.doc_b)
              |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              |  CAST(coalesce(sum(bo), 0) AS BIGINT) AS n_with_media,
              |  CAST(coalesce(sum(CASE WHEN bo = 1 AND ham <= 3
              |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_phash_match,
              |  CAST(coalesce(sum(CASE WHEN bo = 1 THEN ham ELSE 0 END), 0)
              |    AS BIGINT) AS sum_hamming,
              |  CAST(CASE WHEN coalesce(sum(bo), 0) = 0 THEN 0
              |       ELSE (2 * coalesce(sum(CASE WHEN bo = 1 AND ham <= 3
              |             THEN 1 ELSE 0 END), 0) * 1000000
              |           + sum(bo)) // (2 * sum(bo)) END
              |    AS BIGINT) AS match_ppm
              |FROM j""".stripMargin)))
}
