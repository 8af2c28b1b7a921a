package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Irregular-input hardening net for the EMBEDDINGS axis (round-8
  * verdict item 7) — the ANN/kmeans/PQ/SemDeDup family's twin of
  * EdgeCaseCorpusSpec: the whole query surface must survive an
  * embeddings table containing the degenerate geometries a real
  * embedding pipeline produces — zero vectors (norm 0 → NaN cosine),
  * exact duplicate vectors, scaled-basis sets where ALL pairwise
  * distances are equal (every argmin is a tie), antipodal pairs
  * (cosine −1), and extreme magnitudes at the graft_dot exactness
  * bound. Beyond crash-survival, the corpus-independent lattice
  * invariants must hold on this geometry: probe/radius recall
  * monotonicity, the full-width sweep point being exact, and argmin
  * TIE DETERMINISM (two runs of the same query return identical rows
  * — ties break by id, never by partition arrival order).
  */
class EdgeCaseEmbeddingsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcSf = "/root/testdata/sf0.001"
  private val DIM = 64

  /** sf0.001 clone with an adversarial embeddings table. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_edge_emb").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    for (t <- tables)
      Files.createSymbolicLink(Paths.get(s"$d/$t.parquet"),
        Paths.get(s"$srcSf/$t.parquet"))
    import spark.implicits._
    def vec(f: Int => Float): Seq[Float] = (0 until DIM).map(f)
    val edge: Seq[(Long, Seq[Float])] = Seq(
      0L -> vec(_ => 0f),                       // zero vector (a SEED id:
                                                //   cells/codebooks see it)
      1L -> vec(_ => 0.5f),                     // three exact duplicates
      2L -> vec(_ => 0.5f),
      3L -> vec(_ => 0.5f),
      12L -> vec(_ => 1e6f),                    // graft_dot exactness bound
      13L -> vec(_ => 1e-6f),                   // denormal-adjacent tiny
      14L -> vec(_ => -0.5f)                    // antipode of 1/2/3
    ) ++
      // scaled basis vectors: pairwise cosine 0, equal norms, ALL
      // pairwise distances equal — every argmin/argmax is a tie
      (4L to 11L).map(i => i -> vec(j => if (j == i.toInt) 2f else 0f))
    val bulk: Seq[(Long, Seq[Float])] = (15L to 78L).map { i =>
      i -> vec(j => (((i * 31 + j * 17) % 23).toInt - 11) / 10f)
    }
    (edge ++ bulk).map { case (id, e) => (id, e, (id % 4).toInt) }
      .toDF("vec_id", "embedding", "label")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("every query survives the adversarial embeddings (no crash)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries crashing on degenerate embeddings:\n${failures.mkString("\n")}")
  }

  test("recall lattices stay monotone on all-tie geometry") {
    // q107: nested probe sets can only add candidates
    val probe = SparkEntry.queries("q107_ivf_probe_curve")(spark, dir)
      .orderBy(col("n_probe")).select("recall_ppm").collect()
      .map(_.getLong(0)).toSeq
    assert(probe.zip(probe.tail).forall { case (a, b) => a <= b }, probe.toString)
    // q130: radius widening can only add candidates / hits
    val rows = SparkEntry.queries("q130_lsh_radius_sweep")(spark, dir)
      .orderBy(col("radius"))
      .select("n_candidates", "n_hit", "recall_ppm").collect()
    val cand = rows.map(_.getLong(0)).toSeq
    val hit = rows.map(_.getLong(1)).toSeq
    assert(cand.zip(cand.tail).forall { case (a, b) => a <= b }, cand.toString)
    assert(hit.zip(hit.tail).forall { case (a, b) => a <= b }, hit.toString)
    assert(rows.last.getLong(2) == 1000000L,
      s"radius=64 candidates everything — recall must be exact: ${rows.last}")
    // q120: the full-width truncation point IS the exact ranking
    val full = SparkEntry.queries("q120_trunc_recall")(spark, dir)
      .filter(col("dims") === DIM).select("recall_ppm").collect()
    assert(full.nonEmpty && full.head.getLong(0) == 1000000L, full.mkString)
  }

  test("argmin/top-k ties break deterministically (two runs, equal rows)") {
    for (q <- Seq("q50_knn_query", "q55_ann_ivf", "q133_semantic_dedup",
        "q52_label_centroids")) {
      def rows() = SparkEntry.queries(q)(spark, dir).collect()
        .map(_.toString).sorted.toSeq
      val (a, b) = (rows(), rows())
      assert(a == b, s"$q returned different rows across runs:\n$a\nvs\n$b")
      spark.catalog.clearCache()
    }
  }

  test("duplicate vectors land identically everywhere they appear") {
    // the three exact duplicates (ids 1,2,3) must receive identical
    // treatment from the near-dup miner: all three pairwise pairs at
    // cosine 1 survive any threshold
    val nd = SparkEntry.queries("q54_embed_neardup")(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(nd),
      s"exact duplicate pairs must be mined: $nd")
  }
}
