package graft

import graft.functions.{CmsSketchAgg, TextKernels}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests of the count-min sketch: never-undercount, exact
  * when collision-free, merge/reduce equivalence (partial-aggregation
  * soundness), and power-of-two slot addressing vs negative hashes.
  */
class CmsSketchAggSpec extends AnyFunSuite {

  private val depth = 4
  private val width = 256

  private def sketchOf(agg: CmsSketchAgg, vs: Seq[Long]): Array[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("estimates never undercount and are exact without collisions") {
    val agg = CmsSketchAgg(depth, width)
    // 20 distinct bases, frequencies 1..20 — far below width, so
    // same-row collisions are unlikely but the >= bound must hold
    // regardless
    val bases = (1 to 20).map(i => TextKernels.mix64(i * 7919L))
    val stream = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq.fill(i + 1)(b)
    }
    val sk = sketchOf(agg, stream)
    bases.zipWithIndex.foreach { case (b, i) =>
      val est = CmsSketchAgg.estimate(sk, b, depth, width)
      assert(est >= i + 1, s"CMS undercounted: $est < ${i + 1}")
    }
    // total mass per row equals the stream length — nothing lost
    val total = stream.size.toLong
    for (r <- 0 until depth)
      assert(sk.slice(r * width, (r + 1) * width).sum === total)
  }

  test("merge of per-partition sketches equals the sequential sketch") {
    val agg = CmsSketchAgg(depth, width)
    val vs = (1 to 3000).map(i => TextKernels.mix64(i % 97 * 104729L))
    val sequential = sketchOf(agg, vs)
    val merged = vs.grouped(451).map(c => sketchOf(agg, c))
      .foldLeft(agg.zero)(agg.merge)
    assert(merged.toSeq === sequential.toSeq)
  }

  test("innerProduct is the exact join size when no cells collide, an overestimate always") {
    val agg = CmsSketchAgg(depth, width)
    // two multisets over a tiny key domain — collision-free at
    // width 4096 with ~20 distinct keys is near-certain, but the
    // assertion below only relies on the one-sided error bound
    val keysA = (1 to 20).flatMap(k => Seq.fill(k % 4 + 1)(k.toLong))
    val keysB = (11 to 30).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong))
    def base(k: Long) = TextKernels.hash64(k.toString)
    val skA = sketchOf(agg, keysA.map(base))
    val skB = sketchOf(agg, keysB.map(base))
    val est = CmsSketchAgg.innerProduct(skA.toIndexedSeq,
      skB.toIndexedSeq, depth, width)
    val cA = keysA.groupBy(identity).view.mapValues(_.size.toLong)
    val cB = keysB.groupBy(identity).view.mapValues(_.size.toLong)
    val exact = cA.keys.toSeq.map(k => cA(k) * cB.getOrElse(k, 0L)).sum
    assert(est >= exact, s"CMS inner product must never undercount: $est < $exact")
    // and with this few keys the min-row should be collision-free
    assert(est === exact,
      s"20 keys in $width slots should be collision-free on some row: $est vs $exact")
  }

  test("slot addressing handles negative mixed hashes (low-bits mod)") {
    // a base whose mixed row-hash is negative must still land in
    // [0, width) and agree with the unsigned low-bits interpretation
    for (i <- 0 until depth; b <- Seq(Long.MinValue, -1L, Long.MaxValue)) {
      val s = CmsSketchAgg.slot(b, i, width)
      assert(s >= 0 && s < width)
      val unsignedLow =
        (BigInt(java.lang.Long.toUnsignedString(
          TextKernels.mix64(b + i * CmsSketchAgg.GOLDEN))) % width).toInt
      assert(s === unsignedLow)
    }
  }
}
