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
              |ORDER BY media_id""".stripMargin)))
}
