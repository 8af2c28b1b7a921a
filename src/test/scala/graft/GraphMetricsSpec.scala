package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-graph pins for the q134 triangle kernel and the q133
  * semantic-dedup kernel — exact answers on constructed graphs where
  * the scalable-formulation claims are decidable:
  *
  *  - STAR: compact-forward orientation must kill the hub wedge
  *    blowup — a 200-leaf star has 0 triangles and, oriented, the hub
  *    has out-degree 0 (every leaf out-reaches the hub under the
  *    (degree, id) order), so the in-array wedge enumerator emits
  *    NOTHING where a naive o ⨝ o join at an unoriented hub would
  *    enumerate C(200,2) = 19,900 wedges.
  *  - CLIQUE K8: every node sits in C(7,2) = 21 triangles; the
  *    3·C(8,3) charging identity holds exactly.
  *  - Exact-duplicate vectors must be caught by semanticDedup: a
  *    clone lands in its original's cell by construction (identical
  *    quantized coordinates ⇒ identical argmin) and dist² = 0 passes
  *    any threshold.
  */
class GraphMetricsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  test("star-200: zero triangles, hub out-degree 0 kills the wedge blowup") {
    val star = pairsDf((1L to 200L).map(i => (0L, i)))
    val t = Dedup.triangleCounts(star).collect()
    assert(t.length == 201)
    assert(t.forall(_.getLong(2) == 0L), "a star has no triangles")
    val hub = t.find(_.getLong(0) == 0L).get
    assert(hub.getLong(1) == 200L)
  }

  test("clique K8: every node in 21 triangles; 3 x C(8,3) charging holds") {
    val k8 = pairsDf(for {
      a <- 0L until 8L; b <- (a + 1) until 8L
    } yield (a, b))
    val t = Dedup.triangleCounts(k8).collect()
    assert(t.length == 8)
    assert(t.forall(r => r.getLong(1) == 7L && r.getLong(2) == 21L))
    assert(t.map(_.getLong(2)).sum == 3L * 56L) // 3 x C(8,3)
  }

  test("two triangles sharing one node charge the shared node twice") {
    // {0,1,2} and {0,3,4}
    val g = pairsDf(Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (0L, 3L), (3L, 4L), (0L, 4L)))
    val t = Dedup.triangleCounts(g).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t(0L) == 2L)
    assert(Seq(1L, 2L, 3L, 4L).forall(t(_) == 1L))
  }

  test("semanticDedup catches an exact duplicate vector in any cell") {
    import spark.implicits._
    val dim = 64
    // 20 spread-out vectors + vec 100 cloning vec 9 exactly
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until dim).map(d =>
        math.sin(i * 37 + d).toFloat * 50f).toArray)
    }
    val clone = Seq((100L, base(9)._2.clone()))
    val emb = (base ++ clone).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, 1000L).collect()
    assert(out.map(_.getLong(1)).sum == 21L, "cells partition the corpus")
    // the clone's cell reports >= 1 pair and >= 1 dropped vector
    assert(out.map(_.getLong(2)).sum >= 1L, "the exact dup pair must mine")
    assert(out.map(_.getLong(3)).sum >= 1L, "the clone must be droppable")
  }
}
