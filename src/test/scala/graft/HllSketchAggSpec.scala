package graft

import graft.functions.{HllSketchAgg, TextKernels}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch kernel tests plus the load-bearing cross-check: the
  * Aggregator's integer-exact estimate must equal q101's pure-SQL
  * register fold BIT-FOR-BIT on the same hashes — the two forms share
  * one estimator definition (rational α, scaled harmonic mean), and
  * this spec is what keeps them from drifting.
  */
class HllSketchAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def reduceAll(agg: HllSketchAgg, vs: Seq[Long]): Array[Byte] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("duplicates cannot move a register") {
    val agg = HllSketchAgg(8)
    val vs = (1 to 200).map(i => TextKernels.mix64(i.toLong))
    val once = reduceAll(agg, vs)
    val withDups = reduceAll(agg, vs ++ vs.reverse ++ vs.take(50))
    assert(once.toSeq === withDups.toSeq)
  }

  test("estimate within 3 standard errors on 10k uniform hashes") {
    val agg = HllSketchAgg(8) // m=256, rse = 1.04/16 = 6.5%
    val n = 10000
    val vs = (1 to n).map(i => TextKernels.mix64(i.toLong * 0x9E3779B97F4A7C15L))
    val est = agg.finish(reduceAll(agg, vs))
    assert(math.abs(est - n).toDouble / n <= 3 * 1.04 / 16,
      s"estimate $est vs exact $n outside 3 standard errors")
  }

  test("merge of per-partition sketches equals the sequential sketch") {
    val agg = HllSketchAgg(8)
    val vs = (1 to 5000).map(i => TextKernels.mix64(i.toLong + 17))
    val sequential = reduceAll(agg, vs)
    // merge mutates its left buffer (Spark's contract) — fold into a
    // fresh zero so the per-partition sketches stay intact
    val parts = vs.grouped(743).map(chunk => reduceAll(agg, chunk)).toSeq
    val merged = Seq(3, 0, 6, 1, 5, 2, 4).map(parts)
      .foldLeft(agg.zero)(agg.merge)
    assert(merged.toSeq === sequential.toSeq)
    assert(agg.finish(merged) === agg.finish(sequential))
  }

  test("all-zero payload bits take the max rho (w = 0 edge)") {
    val agg = HllSketchAgg(8)
    // v with register bits 0xAB and all 56 payload bits zero
    val v = 0xABL << 56
    val buf = agg.reduce(agg.zero, v)
    assert(buf(0xAB) === 57.toByte) // q = 65 - 8
  }

  test("Aggregator estimate equals q101's SQL register fold bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val hll = udaf(HllSketchAgg(8))
    val tg = graft.operators.Tables.documents(spark, sf)
      .selectExpr("source", "split(text, ' ') AS t")
      .where("size(t) >= 3")
      .selectExpr("source",
        "explode(transform(sequence(0, size(t) - 3), " +
          "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2), " +
          "' ', element_at(t, i + 3)))) AS tg")
    // NO distinct pass — register max is duplicate-immune, which is
    // exactly why the streaming form needs no dedup shuffle
    val viaAgg = tg
      .select(col("source"),
        call_function("graft_mix64", call_function("graft_hash64", col("tg")))
          .as("h"))
      .groupBy(col("source")).agg(hll(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSql = SparkEntry.queries("q101_hll_distinct")(spark, sf)
      .select(col("source"), col("est_hll"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg === viaSql)
    assert(viaAgg.nonEmpty)
  }
}
