package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Ev, Progress}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel against its batch twin (q70's sequential
  * conditional-min chain): the LATEST progress row per user must equal
  * the batch fixpoint when delivery respects per-user order across
  * micro-batches, boundaries must be invisible (cross-batch stage
  * transitions come from state), and a late earlier view must drop
  * rather than retroactively validate a rejected click.
  */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic log: 12 users × 30 events; type pattern varies by
    * user so depths 0–3 all occur (user 11 gets only errors → depth 0;
    * some users click before any view → clicks rejected).
    */
  private def log: Seq[Ev] = {
    val types = Vector("view", "click", "purchase", "error", "signup")
    for {
      u <- 0L until 12L
      i <- 0 until 30
    } yield {
      val t = if (u == 11) "error"
      else types(((i * (u + 2) + u) % 5).toInt)
      Ev(u, 1700000000000L + i * 1000L + u, u * 1000 + i, t)
    }
  }

  /** q70's join chain over a local frame: (userId, depth, tv, tc, tp)
    * with 0 for "not reached" (the streaming encoding).
    */
  private def batchFunnel(evs: Seq[Ev]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val ev = evs.toDF("userId", "ts", "eventId", "eventType")
    val tv = ev.filter(col("eventType") === "view")
      .groupBy(col("userId")).agg(min(col("ts")).as("tv"))
    val tc = ev.filter(col("eventType") === "click")
      .join(tv, "userId").filter(col("ts") > col("tv"))
      .groupBy(col("userId")).agg(min(col("ts")).as("tc"))
    val tp = ev.filter(col("eventType") === "purchase")
      .join(tc, "userId").filter(col("ts") > col("tc"))
      .groupBy(col("userId")).agg(min(col("ts")).as("tp"))
    ev.select(col("userId")).distinct()
      .join(tv, Seq("userId"), "left")
      .join(tc, Seq("userId"), "left")
      .join(tp, Seq("userId"), "left")
      .select(col("userId"),
        when(col("tp").isNotNull, 3L).when(col("tc").isNotNull, 2L)
          .when(col("tv").isNotNull, 1L).otherwise(0L).as("depth"),
        coalesce(col("tv"), lit(0L)).as("tv"),
        coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  /** Latest progress row per user (ties impossible: one emission per
    * state change, MemoryStream preserves arrival order per batch and
    * depth/times are monotone — keep the max tuple).
    */
  private def latest(rows: Seq[Progress]): Map[Long, (Long, Long, Long, Long)] =
    rows.groupBy(_.userId).view.mapValues { ps =>
      val p = ps.maxBy(p => (p.depth, p.tv, p.tc, p.tp))
      (p.depth, p.tv, p.tc, p.tp)
    }.toMap

  test("streamed funnel across 5 micro-batches equals q70's batch fixpoint") {
    import spark.implicits._
    val evs = log
    val input = MemoryStream[Ev](spark)
    val q = StreamingFunnel.progress(input.toDS())
      .writeStream.format("memory").queryName("fn_stream")
      .outputMode("append").start()
    try {
      evs.sortBy(_.eventId).grouped(72).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = latest(spark.table("fn_stream").as[Progress].collect().toSeq)
    val batch = batchFunnel(evs)
    assert(streamed === batch)
    assert(streamed.size === 12)
    assert(streamed(11L) === ((0L, 0L, 0L, 0L)),
      "all-error user stays at depth 0 with a baseline row")
  }

  test("single-batch run equals the batch fixpoint (no boundary artifacts)") {
    import spark.implicits._
    val evs = log
    val input = MemoryStream[Ev](spark)
    val q = StreamingFunnel.progress(input.toDS())
      .writeStream.format("memory").queryName("fn_one")
      .outputMode("append").start()
    try { input.addData(evs); q.processAllAvailable() } finally q.stop()
    assert(latest(spark.table("fn_one").as[Progress].collect().toSeq)
      === batchFunnel(evs))
  }

  test("strict ordering: a click at the view's exact timestamp never advances the funnel") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = StreamingFunnel.progress(input.toDS())
      .writeStream.format("memory").queryName("fn_tie")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1, 1000, 1, "view"), Ev(1, 1000, 2, "click"),
        Ev(1, 2000, 3, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val got = latest(spark.table("fn_tie").as[Progress].collect().toSeq)
    assert(got(1L) === ((2L, 1000L, 2000L, 0L)),
      "the ms == tv click must reject (strict >), the later one counts")
  }

  test("a late earlier view drops — it must not retroactively validate a rejected click") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = StreamingFunnel.progress(input.toDS())
      .writeStream.format("memory").queryName("fn_late")
      .outputMode("append").start()
    try {
      input.addData(Seq(Ev(1, 2000, 2, "click"), Ev(1, 3000, 3, "view")))
      q.processAllAvailable()
      // a view at ts=1000 arrives after the fold passed ts=3000: batch
      // semantics would make the 2000-click valid, but the online
      // operator's order contract drops it (documented determinism)
      input.addData(Seq(Ev(1, 1000, 1, "view"), Ev(1, 4000, 4, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val got = latest(spark.table("fn_late").as[Progress].collect().toSeq)
    assert(got(1L) === ((2L, 3000L, 4000L, 0L)),
      "funnel advances only from the in-order view at 3000")
  }
}
