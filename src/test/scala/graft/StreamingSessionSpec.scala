package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** session_window under Structured Streaming state — the streaming
  * half of q36's sessionization: a session OPENED in one micro-batch
  * and EXTENDED in a later one must merge in the state store, and
  * append-mode output must flush a session only once its gap has
  * passed the watermark. Flushed sessions must equal the batch
  * session_window aggregation over the same rows.
  */
class StreamingSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming session_window merges across micro-batches and matches batch") {
    import spark.implicits._
    val base = 1700000000000L
    val min = 60000L

    // user A: events at 0, 10, 20 min — one session split across
    // batches 1 and 2 (batch 2 extends the open session).
    // user B: events at 0 and 45 min — TWO sessions (gap 30 min).
    val batch1 = Seq(("A", base), ("A", base + 10 * min), ("B", base))
    val batch2 = Seq(("A", base + 20 * min), ("B", base + 45 * min))
    // sentinel far in the future: advances the watermark past every
    // session above so append mode flushes them all
    val batch3 = Seq(("W", base + 600 * min))
    val all = batch1 ++ batch2 ++ batch3

    val input = MemoryStream[(String, Long)](spark)
    val sessions = input.toDF().toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        col("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("sess_stream").outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.sql("SELECT user_id, start_ms, n_events FROM sess_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // batch twin over the same rows, minus the unflushed sentinel
    val expected = all.toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
      .filterNot(_._1 == "W")

    assert(got === expected)
    // the cross-batch merge actually happened: A has ONE session of 3
    assert(got.count(_._1 == "A") === 1)
    assert(got.find(_._1 == "A").get._3 === 3L)
    // and B's 45-minute-later event opened a second session
    assert(got.count(_._1 == "B") === 2)
  }
}
