package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine owns its intermediate-cache lifecycle: queries that
  * persist() signature tables / posting indexes / histograms must
  * leave ZERO SQL-cache entries behind after a single consuming
  * action, with NO caller-side clearCache — the library-user contract
  * (Verify/Bench additionally clearCache per pass, but a plain
  * consumer of the API must not leak).
  */
class CacheLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Listener delivery is async — poll until the cache registry
    * drains (or fail after ~15 s).
    */
  private def awaitCacheEmpty(context: String): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!GraftSqlBridge.sqlCacheIsEmpty(spark)
        && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(GraftSqlBridge.sqlCacheIsEmpty(spark),
      s"$context left SQL-cache entries behind:\n" +
        GraftSqlBridge.cachedPlanHeadlines(spark).mkString("\n"))
  }

  // Queries whose plans persist engine intermediates: q42 (minhash
  // signature table), q46 (shingle index + posting table — a cache
  // built over a cache), q48 (shingled-docs contamination split), q66
  // (source×token tf table), q86 (pinned length histogram), q53
  // (LSH bucket table), q88 (centroid table), q29 (distinct
  // frame-class frame), q89 (shared signature scan), q71 (triple
  // signature table + CC-internal actions), q96 (triple signature
  // table through the savings report), q97 (sig+bands+hl calibration
  // signature table), q101/q102 (distinct-trigram pass). q103 stays
  // in the list as a stays-cache-free guard: its single-pass window
  // shape (round 12) persists nothing at all.
  for (q <- Seq("q42_minhash_lsh_pairs", "q46_ngram_jaccard_pairs",
      "q48_contamination_check", "q66_distinctive_terms",
      "q86_length_drift", "q53_ann_lsh", "q88_label_confusion",
      "q29_class_cooccurrence", "q89_lsh_recall",
      "q71_multi_signal_components", "q96_dup_cluster_stats",
      "q97_minhash_calibration", "q101_hll_distinct",
      "q102_bloom_prefilter", "q103_cdc_chunks", "q104_pq_adc",
      "q107_ivf_probe_curve", "q111_hist_quantiles",
      "q115_source_jaccard_sketch", "q116_mad_outliers",
      "q118_transition_pagerank", "q120_trunc_recall",
      "q121_knn_hubness", "q125_hourly_anomaly",
      "q126_dedup_threshold_sweep", "q127_bigram_surprisal",
      "q128_hist_bin_sweep", "q129_join_size_sketch",
      "q130_lsh_radius_sweep"))
    test(s"$q releases every engine cache after one action, no clearCache") {
      spark.catalog.clearCache() // clean slate from other suites
      // collect(), not count(): count references no columns, so the
      // optimizer may eliminate aggregate-backed outer-join branches
      // wholesale (observed on q126 — the caches were never consumed,
      // never materialized, and correctly stayed pending). The
      // contract under test is "released after the first action that
      // READS the cache", so the probe action must read real columns.
      val n = SparkEntry.queries(q)(spark, sf).collect().length
      assert(n >= 0)
      awaitCacheEmpty(q)
    }

  test("a caller's own persist is never touched by the engine's release") {
    spark.catalog.clearCache()
    val mine = spark.read.parquet(s"$sf/region.parquet").persist()
    assert(mine.count() > 0)
    // run a cache-heavy engine query to completion
    SparkEntry.queries("q42_minhash_lsh_pairs")(spark, sf).count()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!GraftSqlBridge.sqlCacheIsEmpty(spark)
        && System.nanoTime() < deadline) {
      // engine caches drain; the user's entry must remain
      Thread.sleep(50)
    }
    assert(!GraftSqlBridge.sqlCacheIsEmpty(spark),
      "user persist must survive the engine's auto-release")
    assert(GraftSqlBridge.cacheBuilderOf(mine).nonEmpty,
      "the surviving entry must be the caller's own")
    mine.unpersist()
    awaitCacheEmpty("user unpersist")
  }

  test("auto-released caches still share the pass within the one action (result correctness)") {
    spark.catalog.clearCache()
    // same result with and without the release having happened before
    val a = SparkEntry.queries("q42_minhash_lsh_pairs")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    awaitCacheEmpty("first q42 action")
    val b = SparkEntry.queries("q42_minhash_lsh_pairs")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(a === b)
    awaitCacheEmpty("second q42 action")
  }
}
