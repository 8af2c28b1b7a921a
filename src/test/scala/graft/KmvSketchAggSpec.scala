package graft

import graft.functions.{KmvSketchAgg, TextKernels}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests of the KMV distinct sketch (no Spark session):
  * exact below k, duplicate immunity, estimator accuracy on seeded
  * uniform hashes, merge/reduce equivalence (the property partial
  * aggregation relies on), and unsigned ordering of the k-minima.
  */
class KmvSketchAggSpec extends AnyFunSuite {

  private def reduceAll(agg: KmvSketchAgg, vs: Seq[Long]): Array[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("below k the count is exact") {
    val agg = KmvSketchAgg(256)
    val vs = (1 to 100).map(i => TextKernels.mix64(i.toLong))
    assert(agg.finish(reduceAll(agg, vs)) === 100L)
  }

  test("duplicates do not inflate the sketch") {
    val agg = KmvSketchAgg(256)
    val vs = (1 to 50).map(i => TextKernels.mix64(i.toLong))
    val withDups = vs ++ vs ++ vs.take(10)
    assert(agg.finish(reduceAll(agg, withDups)) === 50L)
  }

  test("estimate within 3 standard errors on 10k uniform hashes") {
    val k = 256
    val agg = KmvSketchAgg(k)
    val n = 10000
    val vs = (1 to n).map(i => TextKernels.mix64(i.toLong * 0x9E3779B97F4A7C15L))
    val est = agg.finish(reduceAll(agg, vs))
    val rse = 3.0 / math.sqrt(k.toDouble) // ~18.8%
    assert(math.abs(est - n).toDouble / n <= rse,
      s"estimate $est vs exact $n outside 3 standard errors")
  }

  test("merge of per-partition sketches equals the sequential sketch") {
    val agg = KmvSketchAgg(64)
    val vs = (1 to 5000).map(i => TextKernels.mix64(i.toLong + 17))
    val sequential = reduceAll(agg, vs)
    // 7 uneven partitions, merged in a scrambled order
    val parts = vs.grouped(743).map(chunk => reduceAll(agg, chunk)).toSeq
    val scrambled = Seq(3, 0, 6, 1, 5, 2, 4).map(parts)
    val merged = scrambled.foldLeft(agg.zero)(agg.merge)
    assert(merged.toSeq === sequential.toSeq)
    assert(agg.finish(merged) === agg.finish(sequential))
  }

  test("k-minima use the UNSIGNED 64-bit order (negative longs are large)") {
    // with k=2 over {1, -1}: unsigned(-1) = 2^64-1 is the 2nd minimum,
    // so est = (k-1)*2^64 / (2^64-1) = 1. A signed comparator would
    // pick kth = 1 and blow the estimate up to 2^64.
    val agg = KmvSketchAgg(2)
    assert(agg.finish(reduceAll(agg, Seq(1L, -1L))) === 1L)
  }
}
