package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join under watermarks — the dual-stream
  * correlation the reference's topology implies (detections joined to
  * their enclosing segments) but Flink-side never writes: detections
  * arriving on one stream join segment records arriving on another,
  * within an event-time interval, with bounded state on both sides.
  * The streaming result must equal the batch join over the same rows.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("interval join of detections and segments matches the batch join") {
    import spark.implicits._
    val base = 1700000000000L
    val min = 60000L

    // segments: (stream, segStart) — 3-minute windows per stream
    val segs = Seq(
      ("s1", base), ("s1", base + 3 * min), ("s2", base))
    // detections: (stream, ts) — some inside each segment, delivered
    // across two batches; then a sentinel advances the watermark and a
    // genuinely LATE detection (event time far below the watermark)
    // must be dropped by the streaming join though the batch join
    // would match it
    val dets1 = Seq(
      ("s1", base + 1 * min), ("s1", base + 2 * min), ("s2", base + 1 * min))
    val dets2 = Seq(
      ("s1", base + 4 * min), ("s2", base + 2 * min))
    // sentinels on BOTH inputs: the join's watermark is the MIN across
    // its inputs, so each side must advance for late rows to drop
    val detSentinel = Seq(("s2", base + 60 * min)) // joins nothing
    val segSentinel = Seq(("s9", base + 60 * min)) // stream with no dets
    val late = Seq(("s1", base + 1 * min + 1000L)) // below watermark by ~49 min

    val segIn = MemoryStream[(String, Long)](spark)
    val detIn = MemoryStream[(String, Long)](spark)
    val segDf = segIn.toDF().toDF("stream_id", "seg_ms")
      .select(col("stream_id"), timestamp_millis(col("seg_ms")).as("seg_start"))
      .withWatermark("seg_start", "10 minutes")
    val detDf = detIn.toDF().toDF("det_stream", "det_ms")
      .select(col("det_stream"), timestamp_millis(col("det_ms")).as("det_ts"))
      .withWatermark("det_ts", "10 minutes")

    val joined = detDf.join(segDf,
      col("det_stream") === col("stream_id") &&
        col("det_ts") >= col("seg_start") &&
        col("det_ts") < col("seg_start") + expr("INTERVAL 3 MINUTES"))
      .select(col("det_stream"), unix_millis(col("det_ts")).as("det_ms"),
        col("seg_start"))

    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      segIn.addData(segs)
      detIn.addData(dets1)
      q.processAllAvailable()
      detIn.addData(dets2)
      q.processAllAvailable()
      detIn.addData(detSentinel)
      segIn.addData(segSentinel)
      q.processAllAvailable() // commits watermark ≈ base+50min on both
      detIn.addData(late)
      q.processAllAvailable() // late row filtered before the join
    } finally q.stop()

    val got = spark.sql("SELECT det_stream, det_ms, seg_start FROM ss_join")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2).getTime))
      .toSet

    val batch = (dets1 ++ dets2 ++ detSentinel ++ late)
      .toDF("det_stream", "det_ms")
      .join((segs ++ segSentinel).toDF("stream_id", "seg_ms"),
        col("det_stream") === col("stream_id") &&
          col("det_ms") >= col("seg_ms") &&
          col("det_ms") < col("seg_ms") + lit(3 * min))
      .select(col("det_stream"), col("det_ms"), col("seg_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // the batch join matches the late row; the streaming join must not
    val lateRow = ("s1", base + 1 * min + 1000L, base)
    assert(batch.contains(lateRow), "fixture: late row must be joinable in batch")
    assert(got === batch - lateRow)
    // every on-time detection found exactly its enclosing segment
    assert(got.size === 5)
    assert(got.contains(("s1", base + 4 * min, base + 3 * min)))
    assert(!got.contains(lateRow), "late row must be dropped by the watermark")
  }
}
