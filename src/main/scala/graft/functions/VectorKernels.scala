package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`, `aggregate`) rather
  * than UDFs so the hot path stays inside whole-stage codegen.
  *
  * Float-vs-double note: elements are cast to double BEFORE the fold and
  * accumulated strictly left-to-right — the same order and precision an
  * oracle computing `CAST(e[1] AS DOUBLE)*q1 + ...` uses, so results are
  * bit-reproducible against SQL twins.
  */
object VectorKernels {

  /** Sequential left-to-right sum of an array<numeric> column in double. */
  private def dsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    dsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Dot product against a constant query vector (broadcast as a
    * literal array — no join, no shuffle).
    */
  def dotConst(a: Column, q: Seq[Double]): Column =
    dsum(zip_with(a, array(q.map(lit): _*),
      (x, y) => x.cast("double") * y))

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(dsum(zip_with(a, a, (x, y) => x.cast("double") * y.cast("double"))))

  /** Cosine similarity of two array columns (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Cosine similarity against a constant query vector. */
  def cosineConst(a: Column, q: Seq[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    val n = norm(a) * lit(qn)
    when(n === 0.0, 0.0).otherwise(dotConst(a, q) / n)
  }

  /** Pure-Scala cosine for kernels/tests. */
  def cosineScala(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Component i of deterministic pseudo-random hyperplane p, in
    * [-1,1]. mix64 is essential: the raw polynomial string hash of
    * "plane:p:i" barely changes with the trailing index chars, which
    * would make every plane approximately the same all-ones direction.
    */
  def planeValue(p: Int, i: Int): Double =
    (TextKernels.mix64(TextKernels.hash64(s"plane:$p:$i")) % 1000003L)
      .toDouble / 1000003.0

  def plane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => planeValue(p, i))

  /** Random-hyperplane LSH bucket id for an embedding: sign bits against
    * `nPlanes` deterministic pseudo-random hyperplanes (seeded by plane
    * index — no RNG state, reproducible on any executor). Vectors in the
    * same bucket are likely cosine-close; used to prune ANN candidate
    * pairs from O(n^2) to per-bucket.
    */
  def lshBucket(a: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      when(dotConst(a, plane(p, dim)) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
