package graft

import graft.streaming.BehaviorTrigrams
import graft.streaming.BehaviorTrigrams.{Ev, Trigram}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming trigram miner against its batch twin (q141's double
  * lead window): counts must agree exactly when delivery respects
  * per-user order across micro-batches; micro-batch boundaries must be
  * invisible (cross-batch trigrams come from the two-event state);
  * late events drop without corrupting the sequence.
  */
class BehaviorTrigramsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 7 users × 30 events, types cycling with a user-dependent stride
    * (one type slot null to exercise the '' normalization).
    */
  private def log: Seq[Ev] = {
    val types = Vector("view", "click", "purchase", null, "signup")
    for {
      u <- 0L until 7L
      i <- 0 until 30
    } yield Ev(u, 1700000000000L + i * 1000L + u,
      u * 1000 + i, types(((i * (u + 1)) % 5).toInt))
  }

  private def batchCounts(evs: Seq[Ev]): Map[(String, String, String), Long] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("userId")).orderBy(col("ts"), col("eventId"))
    evs.toDF("userId", "ts", "eventId", "eventType")
      .withColumn("a", coalesce(col("eventType"), lit("")))
      .select(col("a"), lead(col("a"), 1).over(w).as("b"),
        lead(col("a"), 2).over(w).as("c"))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .groupBy(col("a"), col("b"), col("c")).count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
  }

  test("streaming trigrams across 5 micro-batches equal q141's lead window") {
    import spark.implicits._
    val evs = log
    val input = MemoryStream[Ev](spark)
    val q = BehaviorTrigrams.trigrams(input.toDS())
      .writeStream.format("memory").queryName("tg_stream")
      .outputMode("append").start()
    try {
      // per-user order preserved; chunks split mid-sequence so
      // cross-batch trigrams must come from the two-event state
      evs.sortBy(_.eventId).grouped(45).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("tg_stream").as[Trigram].collect()
      .groupBy(t => (t.a, t.b, t.c)).view.mapValues(_.length.toLong).toMap
    val batch = batchCounts(evs)
    assert(streamed === batch)
    assert(streamed.values.sum === 7L * 28)
  }

  test("late events drop; sequences shorter than 3 emit nothing") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = BehaviorTrigrams.trigrams(input.toDS())
      .writeStream.format("memory").queryName("tg_late")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1, 1000, 1, "view")))
      q.processAllAvailable() // 1 event: no trigram possible
      input.addData(Seq(Ev(1, 2000, 2, "click")))
      q.processAllAvailable() // still only 2
      // 1500 is late beyond the stored last (2000): must drop; the
      // on-time purchase completes the only real trigram
      input.addData(Seq(Ev(1, 1500, 3, "error"), Ev(1, 3000, 4, "purchase")))
      q.processAllAvailable()
      input.addData(Seq(Ev(2, 9000, 9, "view"))) // lone user: nothing
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tg_late").as[Trigram].collect()
      .map(t => (t.userId, t.a, t.b, t.c)).toSeq.sorted
    assert(got === Seq((1L, "view", "click", "purchase")))
  }

  test("single-batch delivery equals many-batch delivery (boundaries invisible)") {
    import spark.implicits._
    val evs = log
    def run(name: String, chunk: Int): Map[(String, String, String), Long] = {
      val input = MemoryStream[Ev](spark)
      val q = BehaviorTrigrams.trigrams(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        evs.sortBy(_.eventId).grouped(chunk).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).as[Trigram].collect()
        .groupBy(t => (t.a, t.b, t.c)).view.mapValues(_.length.toLong).toMap
    }
    assert(run("tg_one", 10000) === run("tg_many", 7))
  }
}
