package graft

import graft.functions.{KmvSketchAgg, TextKernels}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch aggregators under Structured Streaming state: a
  * windowed streaming KMV cardinality estimate must equal the batch
  * sketch over the same data — the streaming half of the corpus-
  * profiling story (per-window distinct estimates with O(k) state per
  * window, merged across micro-batches by the state store).
  */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed streaming KMV equals the batch sketch over the same rows") {
    import spark.implicits._
    val kmv = udaf(KmvSketchAgg(32))

    // two event-time minutes x interleaved users, delivered across
    // THREE micro-batches so per-window state must merge across
    // batches (n > k in window 0 exercises the estimator path)
    val base = 1699999980000L // minute-aligned (60000 * 28333333)
    val rows = (0 until 600).map { i =>
      val winIdx = i % 2 // alternate windows so every batch hits both
      val ts = base + winIdx * 60000L + (i / 2 % 50) * 1000L
      val user = TextKernels.mix64(
        if (winIdx == 0) (i / 2 % 120).toLong else (i % 7).toLong)
      (new java.sql.Timestamp(ts), user)
    }

    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val streamed = input.toDF().toDF("ts", "uhash")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(kmv(col("uhash")).as("est"))
    val q = streamed.writeStream.format("memory")
      .queryName("kmv_stream").outputMode("complete").start()
    try {
      rows.grouped(200).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.sql("SELECT window.start, est FROM kmv_stream")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    val batch = rows.toDF("ts", "uhash")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(kmv(col("uhash")).as("est"))
      .select(col("window.start"), col("est"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    assert(got === batch)
    assert(got.size === 2)
    // window 0 has 120 distinct (> k=32: estimator path), window 1 has
    // 7 (< k: exact path)
    assert(got(base + 0L) !== 0L)
    assert(batch.values.toSeq.contains(7L))
  }

  test("windowed streaming HLL equals the batch sketch over the same rows") {
    import spark.implicits._
    val hll = udaf(graft.functions.HllSketchAgg(8))

    val base = 1699999980000L
    val rows = (0 until 600).map { i =>
      val winIdx = i % 2
      val ts = base + winIdx * 60000L + (i / 2 % 50) * 1000L
      val user = TextKernels.mix64(
        if (winIdx == 0) (i / 2 % 120).toLong else (i % 7).toLong)
      (new java.sql.Timestamp(ts), user)
    }

    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val streamed = input.toDF().toDF("ts", "uhash")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(hll(col("uhash")).as("est"))
    val q = streamed.writeStream.format("memory")
      .queryName("hll_stream").outputMode("complete").start()
    try {
      rows.grouped(200).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.sql("SELECT window.start, est FROM hll_stream")
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    val batch = rows.toDF("ts", "uhash")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(hll(col("uhash")).as("est"))
      .select(col("window.start"), col("est"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    // register state merged across three micro-batches by the state
    // store must land exactly where one batch pass lands
    assert(got === batch)
    assert(got.size === 2)
    assert(got.values.forall(_ > 0L))
  }
}
