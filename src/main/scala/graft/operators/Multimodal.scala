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

  val defs: Seq[QueryDef] = Seq(
    // Rows-only: payload features are hash-of-bytes semantics with no
    // ANSI-SQL twin; determinism is unit-tested.
    QueryDef("q60_media_features",
      (s, dir) => extractFeatures(mediaTable(s))
        .select(col("media_id"), col("kind"),
          col("features.mean_byte").as("mean_byte"),
          col("features.entropy").as("entropy"),
          col("features.dominant_bin").as("dominant_bin"),
          col("features.size_bytes").as("size_bytes"))
        .orderBy(col("media_id")),
      None),
    QueryDef("q61_media_frame_sample",
      (s, dir) => sampleFrames(mediaTable(s))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("sampled_bytes"))
        .orderBy(col("media_id")),
      None),
    QueryDef("q62_media_resize",
      (s, dir) => resizeStub(mediaTable(s)).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          length(col("payload")).cast("long").as("thumb_bytes"))
        .orderBy(col("media_id")),
      None))
}
