package graft

import graft.streaming.EventTransitions
import graft.streaming.EventTransitions.{Ev, Transition}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming transition miner against its batch twin (q106's lead
  * window): counts must agree exactly when delivery respects per-user
  * order across micro-batches, late events must drop without
  * corrupting the chain, and batch boundaries must be invisible (the
  * cross-batch transition comes from state).
  */
class EventTransitionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic event log: 9 users × 40 events, types cycling with
    * a user-dependent stride so the transition matrix is non-uniform.
    */
  private def log: Seq[Ev] = {
    val types = Vector("view", "click", "purchase", "error", "signup")
    for {
      u <- 0L until 9L
      i <- 0 until 40
    } yield Ev(u, 1700000000000L + i * 1000L + u,
      u * 1000 + i, types(((i * (u + 1)) % 5).toInt))
  }

  private def batchCounts(evs: Seq[Ev]): Map[(String, String), Long] = {
    import spark.implicits._
    evs.toDF("userId", "ts", "eventId", "eventType")
      .withColumn("nxt", lead(col("eventType"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("userId"))
          .orderBy(col("ts"), col("eventId"))))
      .filter(col("nxt").isNotNull)
      .groupBy(col("eventType"), col("nxt")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  test("streaming transitions across 4 micro-batches equal the batch lead window") {
    import spark.implicits._
    val evs = log
    val input = MemoryStream[Ev](spark)
    val q = EventTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName("tr_stream")
      .outputMode("append").start()
    try {
      // deliver in per-user order, split mid-sequence so cross-batch
      // transitions must come from state
      evs.sortBy(e => (e.eventId)).grouped(90).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("tr_stream").as[Transition].collect()
      .groupBy(t => (t.cur, t.nxt)).view.mapValues(_.length.toLong).toMap
    val batch = batchCounts(evs)
    assert(streamed === batch)
    assert(streamed.values.sum === 9L * 39)
  }

  test("late events drop without corrupting the chain") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName("tr_late")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1, 1000, 1, "view"), Ev(1, 2000, 2, "click")))
      q.processAllAvailable()
      // 1500 is between the two delivered events: late beyond the
      // stored last (2000), must drop — no "click→error" or
      // "view→error" ghost transitions
      input.addData(Seq(Ev(1, 1500, 3, "error"),
        Ev(1, 3000, 4, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tr_late").as[Transition].collect()
      .map(t => (t.cur, t.nxt)).sorted.toSeq
    assert(got === Seq(("click", "purchase"), ("view", "click")))
  }

  test("single-batch run equals the batch window (no boundary artifacts)") {
    import spark.implicits._
    val evs = log
    val input = MemoryStream[Ev](spark)
    val q = EventTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName("tr_one")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("tr_one").as[Transition].collect()
      .groupBy(t => (t.cur, t.nxt)).view.mapValues(_.length.toLong).toMap
    assert(streamed === batchCounts(evs))
  }
}
