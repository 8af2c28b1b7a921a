package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed
  * Aggregator — bounded-memory frequency estimation: `depth` hash rows
  * × `width` counters; a point estimate is the MIN over rows of the
  * addressed counter, an overestimate by at most the collision mass
  * (never an underestimate).
  *
  * Like [[KmvSketchAgg]], the sketch is deterministic end-to-end (slot
  * hashes are mix64 of the caller-supplied base hash offset by
  * golden-ratio steps — the q42 minhash slot scheme), so the DuckDB
  * oracle replays the full sketch in HUGEINT SQL and verifies the
  * ESTIMATES bit-for-bit, not just sanity bounds.
  *
  * Scale design: O(depth·width) state regardless of input, associative
  * vector-add merge → map-side partial aggregation ships one sketch
  * per partition, never the token stream. `width` must be a power of
  * two: slot addressing is then the low bits of the mixed hash, which
  * is the same value under Java's signed arithmetic and the oracle's
  * unsigned residues (a general modulus would disagree in sign).
  */
final case class CmsSketchAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2 && (width & (width - 1)) == 0,
    s"need depth >= 1 and power-of-two width, got $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], base: Long): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + CmsSketchAgg.slot(base, i, width)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsSketchAgg {
  val GOLDEN = 0x9E3779B97F4A7C15L

  /** Row-i slot of a base hash: low bits of mix64(base + i·golden). */
  def slot(base: Long, i: Int, width: Int): Int =
    (TextKernels.mix64(base + i * GOLDEN) & (width - 1)).toInt

  /** Point estimate from a finished sketch: min over rows. */
  def estimate(sketch: IndexedSeq[Long], base: Long, depth: Int,
      width: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + slot(base, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Equi-join size estimate from two sketches built with the SAME
    * (depth, width) over the join key: min over rows of the per-row
    * counter inner product (Cormode & Muthukrishnan 2005 §4.2 /
    * the AGMS inner-product estimator specialized to CMS). Always an
    * OVERESTIMATE of Σ_k cA(k)·cB(k): each row's product contains the
    * true inner product plus non-negative collision cross terms.
    */
  def innerProduct(a: IndexedSeq[Long], b: IndexedSeq[Long], depth: Int,
      width: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      var s = 0L
      var j = 0
      while (j < width) { s += a(i * width + j) * b(i * width + j); j += 1 }
      if (s < best) best = s
      i += 1
    }
    best
  }
}
