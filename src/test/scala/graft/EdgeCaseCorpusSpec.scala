package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Irregular-input hardening net: the whole query surface must survive
  * a `documents` table containing NULL text, empty strings, bare/
  * repeated whitespace, tabs and newlines, unusually long tokens, and
  * non-ASCII (BMP) words — the exact corpus shapes a driver testdata
  * regeneration could introduce (the round-6 ADVICE.md warning: q84/
  * q85 parity held "only because current testdata has no null/empty/
  * multi-space text"). The harness clones sf0.001 and swaps in an
  * adversarial documents.parquet; every query must execute without
  * throwing. This does not replace DuckDB parity — it guarantees the
  * engine side cannot CRASH on irregular text, and that the handful of
  * text-family invariants that are corpus-independent still hold.
  */
class EdgeCaseCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcSf = "/root/testdata/sf0.001"

  /** sf0.001 clone with an adversarial documents table. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_edge").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings")
    for (t <- tables)
      Files.createSymbolicLink(Paths.get(s"$d/$t.parquet"),
        Paths.get(s"$srcSf/$t.parquet"))
    import spark.implicits._
    val normal = (0 until 40).map { i =>
      (i.toLong, s"src${i % 4}", "en",
        (0 until 30).map(j => s"w${(i * 7 + j) % 13}").mkString(" "))
    }
    val edge: Seq[(Long, String, String, String)] = Seq(
      (1000L, "src0", "en", null),                  // NULL text
      (1001L, "src0", "en", ""),                    // empty
      (1002L, "src1", "en", " "),                   // lone space
      (1003L, "src1", "en", "   "),                 // only spaces
      (1004L, "src2", "en", "a  b   c"),            // repeated separators
      (1005L, "src2", "en", "a\tb\nc"),             // tabs + newlines
      (1006L, "src3", "en", " leading trailing "),  // boundary spaces
      (1007L, "src3", "en", "x" * 4096),            // one huge token
      (1008L, "src0", "de", "straße größe müde"),   // non-ASCII BMP
      (1009L, "src1", "en", "solo"))                // single token
    (normal.map(r => (r._1, r._2, r._3, r._4)) ++ edge)
      .toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("every query survives the adversarial corpus (no crash, no hang)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries crashing on irregular text:\n${failures.mkString("\n")}")
  }

  test("corpus-independent invariants hold on the adversarial corpus") {
    // q108: cap arithmetic
    SparkEntry.queries("q108_source_caps")(spark, dir)
      .select("n_docs", "kept_docs").collect().foreach { r =>
        assert(r.getLong(1) == math.min(10L, r.getLong(0)), r.toString)
      }
    // q110: nested ctx lengths stay monotone
    val splits = SparkEntry.queries("q110_packing_curve")(spark, dir)
      .orderBy(col("ctx_len")).select("split_docs").collect()
      .map(_.getLong(0)).toSeq
    assert(splits.zip(splits.tail).forall { case (a, b) => a >= b },
      splits.toString)
    // q113: session lattice stays monotone
    val ns = SparkEntry.queries("q113_session_gap_sweep")(spark, dir)
      .orderBy(col("gap_limit_ms")).select("n_sessions").collect()
      .map(_.getLong(0)).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.toString)
    // q115: estimator structure
    SparkEntry.queries("q115_source_jaccard_sketch")(spark, dir)
      .select("inter_exact", "kmv_both").collect().foreach { r =>
        assert(r.getLong(1) <= r.getLong(0), r.toString)
      }
    // q151: mass identity survives NULL/empty/whitespace texts
    SparkEntry.queries("q151_soft_dedup_weights")(spark, dir)
      .select("n_docs", "eff_mass_ppm", "removed_mass_ppm").collect()
      .foreach { r =>
        assert(r.getLong(1) + r.getLong(2) == r.getLong(0) * 1000000L,
          r.toString)
      }
    // q152: the split census still partitions the corpus, zero leaks
    val sp = SparkEntry.queries("q152_leakage_free_split")(spark, dir)
      .select("n_docs", "n_cross_pairs").collect()
    assert(sp.forall(_.getLong(1) == 0), sp.mkString(","))
    assert(sp.map(_.getLong(0)).sum == 50L,
      "40 normal + 10 edge docs, each in exactly one split")
  }
}
