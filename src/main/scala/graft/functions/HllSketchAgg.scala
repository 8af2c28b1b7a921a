package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed Aggregator — the
  * streaming/library twin of q101's pure-SQL register fold (Flajolet,
  * Fusy, Gandouet & Meunier 2007). Same estimator, bit-for-bit: the
  * register index is the top `p` bits of the (pre-mixed) hash, rho is
  * the leading-zero rank of the remaining 64−p bits, and the harmonic
  * mean is evaluated in EXACT integer arithmetic — Σ 2^−Mj scaled by
  * 2^Q (Q = 65−p, the max rho) into T = Σ 2^(Q−Mj), with the bias
  * constant α_m = 0.7213/(1+1.079/m) kept as the exact rational
  * 7213·m / (10000·m + 10790), so `finish` is one BigInt division and
  * HllSketchAggSpec can assert equality against the SQL form (a float
  * α would drift in the last ulp between evaluation orders).
  *
  * Raw-regime estimator only, like q101: production HLL switches to
  * linear counting below 2.5·m, which needs ln() — callers who want
  * the corrected regime can read the zero-register count from the
  * buffer themselves. The α approximation is the published m ≥ 128
  * constant, hence p ≥ 7.
  *
  * Scale design: the buffer is a FLAT m-byte register array (256 B at
  * p = 8 — smaller than KMV's 2 KB for comparable error), reduce and
  * merge are in-place byte-max — associative, commutative and
  * idempotent, so Spark partial-aggregates map-side and the state
  * store merges windows across micro-batches with O(m) state per
  * window (the StreamingSketchSpec property). Duplicates cannot move
  * any register, so the input needs NO distinct pass — the property
  * that lets a 100 TB stream flow through without a dedup shuffle.
  *
  * Input is a pre-mixed 64-bit hash (`graft_mix64(graft_hash64(x))`),
  * not the raw value — same contract as [[KmvSketchAgg]]: the caller
  * picks the hash, the sketch trusts its uniformity.
  */
final case class HllSketchAgg(p: Int = 8)
    extends Aggregator[Long, Array[Byte], Long] {
  require(p >= 7 && p <= 16, s"HLL needs 7 <= p <= 16, got $p")

  private val m = 1 << p
  private val q = 65 - p // max rho: all 64-p payload bits zero
  private val wMask = (1L << (64 - p)) - 1

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    val j = (v >>> (64 - p)).toInt
    val w = v & wMask
    // rho = 1 + leading zeros of w within its 64-p bit field
    //     = nlz64(w) - p + 1  (w = 0 → the field is all zeros → q)
    val rho =
      if (w == 0L) q else java.lang.Long.numberOfLeadingZeros(w) - p + 1
    if (rho > buf(j)) buf(j) = rho.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var t = BigInt(0)
    var i = 0
    while (i < m) {
      t += BigInt(1) << (q - buf(i))
      i += 1
    }
    // α·m²·2^Q / T with α = 7213m/(10000m+10790); for p=8 this is the
    // exact quotient q101's SQL computes (same rational, same floor)
    ((BigInt(7213) * m * m * m << q) /
      (BigInt(10000) * m * t + BigInt(10790) * t)).toLong
  }

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
