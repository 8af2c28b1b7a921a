package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-width histogram sketch as a typed Aggregator — the custom
  * UDAF surface (Aggregator[IN, BUF, OUT] → functions.udaf). The
  * buffer is a bin-count array: O(bins) state, associative merge, so
  * it partial-aggregates map-side and scales like any hash agg.
  * Values outside [lo, hi) clamp to the edge bins (DuckDB
  * width_bucket semantics with under/overflow folded in, which keeps
  * the oracle exact — counts are integers, no FP drift).
  */
final case class HistogramAgg(bins: Int, lo: Double, hi: Double)
    extends Aggregator[Double, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](bins)

  override def reduce(buf: Array[Long], v: Double): Array[Long] = {
    // NaN is skipped (not clamped to bin 0): keeps the aggregator a
    // total function. The q28 DuckDB oracle mirrors this with an
    // explicit `NOT isnan(confidence)` filter — floor() on NaN would
    // otherwise error or mis-bin rather than "select no bin".
    if (!v.isNaN) {
      val raw = ((v - lo) / (hi - lo) * bins).toInt
      val bin = math.min(bins - 1, math.max(0, raw))
      buf(bin) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
