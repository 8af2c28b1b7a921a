package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. First-line defense at runtime is
  * AQE's skew-join splitting (on by default in Spark 4); this helper is
  * the explicit-plan alternative for when the skew is KNOWN ahead of
  * time (power-law keys in a fact table) and the other side is small
  * enough to replicate but too large / too dynamic to broadcast.
  *
  * Mechanics: the big side gets a deterministic salt in [0, salts)
  * derived from its non-key columns, widening each hot key into
  * `salts` shuffle keys; the small side is replicated `salts` times
  * (explode over a literal range — `salts`× its size, which is the
  * price of not broadcasting). The join key becomes (key, salt), so
  * one hot key's rows spread over `salts` reducers instead of one.
  * Inner-join semantics are unchanged.
  */
object Skew {

  /** Inner equi-join of `big` (skewed on `key`) with `small`,
    * spreading each of big's keys across `salts` shuffle partitions.
    * The salt is `pmod(hash(all big columns), salts)` — deterministic,
    * no RNG state, stable under retries (a rand() salt breaks task
    * retry idempotence).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val bigCols = big.columns.map(col).toIndexedSeq
    // Alias both sides so the join condition is lineage-unambiguous even
    // when `big` and `small` derive from the same source (self-join):
    // dataframe-apply column references on shared lineage make Spark warn
    // "trivially true equals predicate" and fall back to positional
    // disambiguation, which a future Spark could resolve differently.
    val saltedBig = big.withColumn("__salt",
      pmod(hash(bigCols: _*), lit(salts))).alias("__skew_big")
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .alias("__skew_small")
    val joined = saltedBig.join(saltedSmall,
      col("__skew_big.__salt") === col("__skew_small.__salt") &&
        col(s"__skew_big.`$key`") === col(s"__skew_small.`$key`"))
    val outCols = big.columns.map(c => col(s"__skew_big.`$c`")) ++
      small.columns.filterNot(_ == key).map(c => col(s"__skew_small.`$c`"))
    joined.select(outCols.toIndexedSeq: _*)
  }
}
