package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q136 OLS kernel past int64-product territory (round-8
  * advice). The synthetic source's Σx = 4.5e9, so (Σx)² ≈ 2.03e19
  * overflows a signed 64-bit product — if any slope/intercept product
  * were evaluated as long*long (ANSI off wraps silently), the ppm
  * values would diverge from the BigInt-exact reference computed here
  * with the same half-up `div` formula. The spec drives
  * olsSufficientStats directly — the exact code path q136 runs.
  */
class OlsOverflowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Half-up ppm ratio via truncating integral division, BigInt-exact:
    * (2·num·10⁶ + den) div (2·den) — mirrors the Spark expression.
    */
  private def ppm(num: BigInt, den: BigInt): Long =
    ((2 * num * 1000000 + den) / (2 * den)).toLong

  test("slope/intercept stay exact when (Σx)² overflows int64") {
    import spark.implicits._
    val big = Seq( // x ~1.5e9 each: sums fit long, products don't
      (1400000000L, 1000000000L),
      (1500000000L, 1100000000L),
      (1600000000L, 1300000000L))
    val small = Seq( // y = 2x + 1 exactly
      (1L, 3L), (2L, 5L), (3L, 7L))
    val xy = (big.map { case (x, y) => ("big", x, y) } ++
      small.map { case (x, y) => ("small", x, y) })
      .toDF("source", "x", "y")

    val rows = TextAnalysis.olsSufficientStats(xy)
      .orderBy("source").collect()
    assert(rows.length == 2)

    // BigInt-exact reference for the big source
    val n = BigInt(big.length)
    val sx = big.map(p => BigInt(p._1)).sum
    val sy = big.map(p => BigInt(p._2)).sum
    val sxx = big.map(p => BigInt(p._1) * p._1).sum
    val sxy = big.map(p => BigInt(p._1) * p._2).sum
    val syy = big.map(p => BigInt(p._2) * p._2).sum
    assert(sx * sx > BigInt(Long.MaxValue),
      "test must actually cross the int64 product boundary")
    val den = n * sxx - sx * sx
    val expSlope = ppm(n * sxy - sx * sy, den)
    val expIcept = ppm(sy * sxx - sx * sxy, den)
    // teeth: the long-wrapped formula must give a DIFFERENT slope,
    // otherwise this spec couldn't detect a long*long regression
    val wrapDen = n.toLong * sxx.toLong - sx.toLong * sx.toLong
    val wrapSlope = (2 * (n.toLong * sxy.toLong - sx.toLong * sy.toLong)
      * 1000000L + wrapDen) / (2 * wrapDen)
    assert(wrapSlope != expSlope, "chosen values must expose the wrap")

    val b = rows(0)
    assert(b.getString(0) == "big")
    assert(b.getLong(1) == 3L)
    assert(b.getLong(2) == sx.toLong && b.getLong(3) == sy.toLong)
    assert(b.getLong(4) == sxx.toLong && b.getLong(5) == sxy.toLong &&
      b.getLong(6) == syy.toLong)
    assert(b.getLong(7) == expSlope, s"slope_ppm: got ${b.getLong(7)}, " +
      s"want $expSlope — a long*long wrap in the decimal path?")
    assert(b.getLong(8) == expIcept)

    val s = rows(1)
    assert(s.getString(0) == "small")
    assert(s.getLong(7) == 2000000L, "y=2x+1 slope must be exactly 2.0")
    assert(s.getLong(8) == 1000000L, "y=2x+1 intercept must be exactly 1.0")
  }
}
