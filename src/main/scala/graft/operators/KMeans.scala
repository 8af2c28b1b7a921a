package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding DataFrame — the q98
  * single iteration run to convergence: the trainer that produces the
  * IVF cells q55/q95 probe (their `label` column stands in for this
  * assignment in the harness corpus; a production index trains cells
  * here at ingest).
  *
  * Determinism contract (the engine-wide rule): vectors are quantized
  * to the exact 1e-4 integer domain (q52's rationale) before any
  * distance, so assignments — and therefore counts, means, and wcss —
  * are identical at any partition count, any thread count, and across
  * reruns; argmin ties break toward the lower centroid id via
  * lexicographic struct ordering. No RNG: seeds are the k
  * lowest-`vec_id` rows (k-means++ would need a sequential sampling
  * pass; deterministic seeds keep the trainer replayable and the
  * harness corpus is near-isotropic anyway).
  *
  * 100 TB shape, per iteration: ONE corpus scan; the k-row codebook
  * folds to a single array row and cross-broadcasts onto the scan
  * (k = 65536 × 64 dims × 8 B ≈ 34 MB — still broadcastable);
  * assignment is a per-row array fold; the only exchange carries
  * (cid, dim) partial sums — k·64 rows per map task. The codebook
  * between iterations is k rows on the driver-side PLAN only (the
  * frame is `localCheckpoint`ed to cut the O(iters)-deep lineage, the
  * connected-components precedent — never `collect`ed).
  */
object KMeans {

  /** Exactness domain of the 1e-4 quantization: |q| ≤ 1.1e7 (real
    * components |x| ≤ 1100 — every published embedding space sits far
    * inside). Within the domain every pairwise diff is ≤ 2.2e7, its
    * square ≤ 4.84e14, and a 64-dim sum ≤ 3.1e16 — inside int64 AND
    * inside double's 2^53 integer window, so both the per-dim integer
    * fold and the fused graft_dot double expansion are exact and
    * equal. Components beyond the domain SATURATE deterministically
    * instead of overflowing an ANSI multiply mid-pass (the
    * EdgeCaseEmbeddingsSpec 1e6-magnitude fixture; a single absurd
    * vector must not kill a 100 TB scoring job).
    */
  private[graft] val QCLAMP = 11000000L

  /** The shared quantize expression — round to 1e-4, clamp to the
    * exactness domain.
    */
  private[graft] def qcol(x: Column): Column =
    least(greatest(round(x.cast("double") * 10000).cast("long"),
      lit(-QCLAMP)), lit(QCLAMP))

  /** Quantized-vector projection: (id, qa array<long>) at 1e-4. */
  private[graft] def quantized(e: DataFrame, idCol: String, vecCol: String): DataFrame =
    e.select(col(idCol).as("id"),
      transform(col(vecCol), x => qcol(x)).as("qa"))

  /** Squared L2 distance between two quantized arrays, exact int64. */
  private[graft] def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, e) => acc + e)

  /** One-row frame holding the sorted (cid, cq) codebook array. */
  private[graft] def fold(cents: DataFrame): DataFrame =
    cents.select(struct(col("cid"), col("cq")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("cents"))

  /** Nearest-centroid id + distance for every row of `q` against the
    * folded codebook: (id, qa, cid, d2).
    */
  private[graft] def assignAgainst(q: DataFrame, folded: DataFrame): DataFrame =
    q.crossJoin(broadcast(folded))
      .select(col("id"), col("qa"),
        array_min(transform(col("cents"), c => struct(
          dist2(col("qa"), c.getField("cq")).as("d2"),
          c.getField("cid").as("cid")))).as("m"))
      .select(col("id"), col("qa"),
        col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** Train `k` centroids for `iters` Lloyd iterations over
    * `e.(idCol, vecCol)`. Returns the final codebook
    * (cid, cq array<long> quantized 1e-4, n, wcss): n/wcss are the
    * last iteration's membership count and within-cluster sum of
    * squared quantized distances (the convergence number a driver
    * loops on). A cluster that loses all members keeps its previous
    * centroid (n = 0, wcss = 0) — the standard empty-cell rule.
    */
  def fit(e: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1, got ($k, $iters)")
    val q = quantized(e, idCol, vecCol)
    // deterministic seeds: the k lowest-id rows, renumbered 0..k-1
    var cents = q.orderBy(col("id")).limit(k)
      .select(col("id"), col("qa"))
      .withColumn("cid",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("id"))) - 1).cast("long"))
      .select(col("cid"), col("qa").as("cq"))
      .localCheckpoint()
    var out: DataFrame = null
    for (_ <- 0 until iters) {
      val asg = assignAgainst(q, fold(cents))
      val stats = asg
        .select(col("cid"), col("d2"), posexplode(col("qa")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(col("d2")).as("wcss"))
        .groupBy(col("cid"))
        .agg(first(col("n")).as("n"), first(col("wcss")).as("wcss"),
          array_sort(collect_list(struct(col("dim"),
            // exact half-up integer mean, shifted positive (q52's
            // formula; the 2e7 shift guards |v| up to 2000 where
            // q52/q98's corpus-bounded 1e6 guards |v| <= 100 — any
            // sufficient shift yields the identical quotient, since
            // 2·S·n is an exact multiple of the 2·n divisor)
            expr("((sv + 20000000 * n) * 2 + n) div (2 * n) - 20000000")
              .as("cv")))).as("d"))
        .select(col("cid"), transform(col("d"), p => p.getField("cv")).as("cq"),
          col("n"), col("wcss"))
      // empty-cell rule: clusters with no members keep their centroid
      out = cents.select(col("cid"), col("cq").as("cq_prev"))
        .join(stats.withColumnRenamed("cid", "cid_s"),
          col("cid") === col("cid_s"), "left")
        .select(col("cid"), coalesce(col("cq"), col("cq_prev")).as("cq"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("wcss"), lit(0L)).as("wcss"))
        .localCheckpoint() // cut the O(iters) lineage; k rows, executor-held
      cents = out.select(col("cid"), col("cq"))
    }
    out
  }

  /** Assign every row of `e` to its nearest centroid of a trained
    * codebook (the `fit` output): (id, cid, d2). This is the cell
    * labelling an IVF index stores per vector at ingest.
    */
  def assign(e: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignAgainst(quantized(e, idCol, vecCol),
      fold(codebook.select(col("cid"), col("cq"))))
      .select(col("id"), col("cid"), col("d2"))
}
