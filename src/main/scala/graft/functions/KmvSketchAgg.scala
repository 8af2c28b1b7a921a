package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed Aggregator — the
  * deterministic alternative to HLL (`approx_count_distinct`, q27)
  * whose estimate is reproducible bit-for-bit in ANSI SQL, so the
  * oracle can verify it exactly (HLL sketches differ across engines
  * and admit no cross-engine check).
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream"): keep the k smallest DISTINCT hash values under the
  * unsigned 64-bit order; with fewer than k values the count is exact,
  * otherwise estimate n ≈ (k-1) · 2⁶⁴ / kth-min. Relative error
  * ~1/√k (k = 256 → ~6%).
  *
  * Scale design: the buffer is O(k) regardless of input size and the
  * merge is associative, so Spark partial-aggregates map-side — a
  * 100 TB group shuffles one 2 KB sketch per partition instead of
  * every distinct value (`countDistinct` expands + reshuffles all
  * values). This is the shape that makes per-group cardinality
  * profiling feasible corpus-wide.
  *
  * Buffer values are stored FLIPPED (`v ^ Long.MinValue`) so the
  * natural signed order of the sorted array IS the unsigned order of
  * the original hashes — binary search and merge need no custom
  * comparator, and the DuckDB oracle's HUGEINT residues (always in
  * [0, 2⁶⁴)) sort identically.
  */
final case class KmvSketchAgg(k: Int)
    extends Aggregator[Long, Array[Long], Long] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val f = v ^ Long.MinValue
    if (buf.length >= k && f >= buf(buf.length - 1)) return buf // not a min
    val pos = java.util.Arrays.binarySearch(buf, f)
    if (pos >= 0) return buf // distinct-value semantics: drop duplicates
    val ins = -pos - 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = f
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) }
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 } // dedup ties
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      // kth smallest unsigned hash, un-flipped back to its residue
      val kth = buf(k - 1) ^ Long.MinValue
      val kthU = BigInt(java.lang.Long.toUnsignedString(kth))
      // kthU >= k-1 >= 1 (buffer holds k distinct unsigned values)
      ((BigInt(k - 1) << 64) / kthU).toLong
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
