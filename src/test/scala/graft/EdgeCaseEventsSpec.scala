package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EdgeCaseCorpusSpec's treatment for the OTHER two fact tables: the
  * whole query surface must survive adversarial `events` (NULL
  * event_type/user_id/ts/value, NaN and ±huge values, empty-string
  * types, malformed JSON props, ties at the exact same timestamp,
  * epoch-boundary and pre-epoch timestamps) and adversarial `lineitem`
  * → derived `detections` (NULL keys, zero/negative line numbers →
  * degenerate bboxes, NULL confidence inputs, zero-detection frames by
  * way of NULL frame keys) — the shapes a driver testdata regeneration
  * or a real ingest could introduce. Appends edge rows to the real
  * sf0.001 tables so every query still has its normal data underneath;
  * asserts no query throws, plus the handful of corpus-independent
  * invariants that must hold on ANY input.
  */
class EdgeCaseEventsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcSf = "/root/testdata/sf0.001"

  /** sf0.001 clone with adversarial events + lineitem tables. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_edge_ev").toString
    val passthrough = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "documents", "embeddings")
    for (t <- passthrough)
      Files.createSymbolicLink(Paths.get(s"$d/$t.parquet"),
        Paths.get(s"$srcSf/$t.parquet"))
    import spark.implicits._

    // ── events: original rows + adversarial tail. Written through the
    // normalizing reader so the physical type is plain micros.
    val ev = graft.operators.Tables.events(spark, srcSf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val t0 = java.sql.Timestamp.valueOf("1970-01-01 00:00:00") // epoch
    val tNeg = new java.sql.Timestamp(-1L)                     // pre-epoch
    val tTie = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val edgeEv = Seq[(Long, Option[java.sql.Timestamp], Option[Long],
        String, Option[Double], String)](
      (900000L, Some(tTie), Some(7L), null, Some(1.0), "{}"),
      (900001L, Some(tTie), Some(7L), "", Some(2.0), "{}"), // empty type
      (900002L, Some(tTie), Some(7L), "view", Some(Double.NaN), "{}"),
      (900003L, Some(tTie), Some(7L), "view", Some(1e15), "{}"),
      (900004L, Some(tTie), Some(7L), "view", Some(-42.5), "{}"),
      (900005L, Some(tTie), Some(7L), "purchase", Some(3.0), "{"),
      (900006L, Some(tTie), Some(7L), "click", Some(4.0), null),
      (900007L, Some(t0), Some(8L), "view", Some(5.0), "{}"),   // epoch
      (900008L, Some(tNeg), Some(8L), "purchase", Some(6.0), "{}"),
      // three ties on the SAME (user, ts): window determinism relies
      // on the (ts, event_id) secondary key
      (900009L, Some(tTie), Some(9L), "view", Some(1.0), "{}"),
      (900010L, Some(tTie), Some(9L), "click", Some(1.0), "{}"),
      (900011L, Some(tTie), Some(9L), "purchase", Some(1.0), "{}"),
      (900012L, None, Some(10L), "view", Some(1.0), "{}"),  // NULL ts
      (900013L, Some(tTie), None, "view", Some(1.0), "{}"), // NULL user
      (900014L, Some(tTie), Some(11L), "view", None, "{}")) // NULL value
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.unionByName(edgeEv)
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/events.parquet")

    // ── lineitem: original rows + rows that make derived detections
    // degenerate (NULL frame/supp/part keys, zero and negative line
    // numbers shrinking the synthesized bbox, NULL measures)
    val li = spark.read.parquet(s"$srcSf/lineitem.parquet")
    val cols = li.columns
    val edgeLi = Seq(
      ("900000", "1", "1", "0"),    // det_id 0, bbox height floor
      ("900001", "1", "1", "-3"),   // negative det_id, x2 < x1 + 64
      ("null", "2", "2", "1"),      // NULL frame_id
      ("900002", "null", "3", "1"), // NULL part → NULL class/conf/x1
      ("900003", "4", "null", "1")) // NULL supp → NULL stream/y1
      .map { case (ok, pk, sk, ln) =>
        (if (ok == "null") None else Some(ok.toLong),
          if (pk == "null") None else Some(pk.toLong),
          if (sk == "null") None else Some(sk.toLong),
          ln.toInt)
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .withColumn("l_quantity", lit(null).cast("double"))
      .withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate",
        lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .select(cols.map(col).toIndexedSeq: _*)
    li.unionByName(edgeLi)
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("every query survives adversarial events + detections (no crash)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries crashing on irregular events/detections:\n${
        failures.mkString("\n")}")
  }

  test("corpus-independent invariants hold on the adversarial tables") {
    // q27: HLL structure — registers bounded, exact <= rows
    SparkEntry.queries("q27_approx_distinct")(spark, dir)
      .collect().foreach { r =>
        assert(r.getLong(3) <= 256, r.toString)
        assert(r.getLong(2) <= r.getLong(1), r.toString)
      }
    // q38: histogram percentiles are monotone p50 <= p95 <= p99
    SparkEntry.queries("q38_approx_percentiles")(spark, dir)
      .collect().foreach { r =>
        assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5),
          r.toString)
      }
    // q113: session-count lattice stays monotone in the gap limit
    val ns = SparkEntry.queries("q113_session_gap_sweep")(spark, dir)
      .orderBy(col("gap_limit_ms")).select("n_sessions").collect()
      .map(_.getLong(0)).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.toString)
    // q118: PageRank mass conservation survives NULL-typed transitions
    val prs = SparkEntry.queries("q118_transition_pagerank")(spark, dir)
      .select("pr_ppm").collect().map(_.getLong(0)).toSeq
    assert(prs.nonEmpty && math.abs(prs.sum - 1000000L) <= 1000,
      s"rank mass must be ~1e6 up to floor rounding: ${prs.sum}")
    // q122: Gini stays in [0, 1e6] whatever the value column held
    SparkEntry.queries("q122_value_gini")(spark, dir)
      .select("gini_ppm").collect().foreach { r =>
        if (!r.isNullAt(0))
          assert(r.getLong(0) >= 0 && r.getLong(0) <= 1000000, r.toString)
      }
  }
}
