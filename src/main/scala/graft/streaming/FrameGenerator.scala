package graft.streaming

import graft.model.{FrameMetadata, VideoFrame}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Seeded synthetic frame generator replicating the reference mock
  * producer's shape (mock/VideoStreamMockProducer.java:201-245,
  * defaults :283-288 — 25 fps, 3 streams) with DETERMINISTIC payloads
  * and timestamps instead of wall-clock (SURVEY.md §7.3: reference
  * non-determinism replaced by data-derived values so outputs
  * hash-match across runs).
  *
  * Frame bytes are a seeded xorshift stream; a scene change (payload
  * distribution shift, which drops histogram similarity below the
  * keyframe threshold) is injected every `sceneChangeEvery` frames.
  */
object FrameGenerator {

  val BASE_TS = 1700000000000L // fixed epoch origin, not wall-clock

  def frameBytes(seed: Long, scene: Int, n: Int = 256): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 6364136223846793005L + 1442695040888963407L + scene * 997L
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      // bias the byte distribution by scene id so different scenes have
      // visibly different histograms (drives the similarity rule)
      out(i) = (((x & 0x7f) + scene * 37) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic frame sequence for `streams` cameras at `fps` for
    * `durationSec` (driver-side; for tests and MemoryStream feeding).
    */
  def frames(streams: Int = 3, fps: Int = 25, durationSec: Int = 60,
      sceneChangeEvery: Int = 40): Seq[VideoFrame] = {
    val perStream = fps * durationSec
    for {
      s <- 0 until streams
      i <- 0 until perStream
    } yield VideoFrame(
      streamId = f"camera_${s + 1}%03d",
      frameId = s.toLong * perStream + i,
      timestamp = BASE_TS + i * (1000L / fps),
      frameData = frameBytes(s.toLong * 1000003L + i, i / sceneChangeEvery),
      frameSequence = i,
      metadata = FrameMetadata(1920, 1080, fps, "jpeg"))
  }

  /** Distributed variant via spark.range — the shape a 100 TB backfill
    * generator would take (no driver-side materialization).
    */
  def framesDs(spark: SparkSession, streams: Int, fps: Int,
      durationSec: Int, sceneChangeEvery: Int = 40): Dataset[VideoFrame] = {
    import spark.implicits._
    val perStream = fps * durationSec
    spark.range(0L, streams.toLong * perStream).map { id =>
      val s = (id / perStream).toInt
      val i = (id % perStream).toInt
      VideoFrame(
        streamId = f"camera_${s + 1}%03d",
        frameId = id,
        timestamp = BASE_TS + i * (1000L / fps),
        frameData = frameBytes(s.toLong * 1000003L + i, i / sceneChangeEvery),
        frameSequence = i,
        metadata = FrameMetadata(1920, 1080, fps, "jpeg"))
    }
  }
}
