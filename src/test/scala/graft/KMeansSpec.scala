package graft

import graft.operators.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed Lloyd trainer (operators/KMeans): convergence,
  * exactness vs a driver-side recompute, determinism under
  * repartitioning, and the empty-cell rule.
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 3 well-separated clusters around (0,0,0,0), (10,..), (-10,..),
    * 20 points each, deterministic offsets in [-1, 1].
    */
  private def corpus: DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val center = Seq(0.0, 10.0, -10.0)(c)
      val off = Seq.tabulate(4)(d => ((i * 7 + d * 3) % 21 - 10) / 10.0)
      (c * 20L + i, off.map(o => (center + o).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def wcssTotal(fitted: DataFrame): Long =
    fitted.agg(sum("wcss")).head.getLong(0)

  test("wcss is non-increasing across Lloyd iterations") {
    val w = (1 to 4).map(i => wcssTotal(KMeans.fit(corpus, 3, i)))
    assert(w.sliding(2).forall { case Seq(a, b) => b <= a },
      s"wcss must not increase: $w")
  }

  test("well-separated clusters are recovered exactly (purity 1.0)") {
    val cod = KMeans.fit(corpus, 3, 4)
    val asg = KMeans.assign(corpus, cod).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every true cluster maps to exactly one learned cid
    val groups = (0 until 3).map(c =>
      (0 until 20).map(i => asg(c * 20L + i)).toSet)
    assert(groups.forall(_.size == 1), s"split cluster: $groups")
    assert(groups.flatten.toSet.size == 3, s"merged clusters: $groups")
  }

  test("assign matches a driver-side integer recompute") {
    val cod = KMeans.fit(corpus, 3, 2)
    val cents = cod.select("cid", "cq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    val vecs = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(v =>
        math.round(v.toDouble * 10000)))
    val expect = vecs.map { case (id, qa) =>
      val scored = cents.map { case (cid, cq) =>
        (qa.zip(cq).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }
      id -> scored.min
    }.toMap
    val got = KMeans.assign(corpus, cod).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(1)))).toMap
    assert(got === expect)
  }

  test("training is invariant under repartitioning (bit-identical codebook)") {
    def key(df: DataFrame): Seq[(Long, Seq[Long], Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val a = key(KMeans.fit(corpus, 3, 3))
    val b = key(KMeans.fit(corpus.repartition(7), 3, 3))
    assert(a === b)
  }

  test("empty cells keep their previous centroid with n = 0") {
    import spark.implicits._
    // 2 distinct points, k = 3: one cell must starve
    val tiny = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 0f, 0f)),
      (2L, Seq(5f, 5f, 5f, 5f))).toDF("vec_id", "embedding")
    val cod = KMeans.fit(tiny, 3, 2)
    val rows = cod.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).sortBy(_._1)
    assert(rows.length == 3)
    assert(rows.exists(_._3 == 0L), s"expected a starved cell: ${rows.toSeq}")
    assert(rows.map(_._3).sum == 3L, "every vector assigned exactly once")
  }
}
