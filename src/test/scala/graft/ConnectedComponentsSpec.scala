package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Convergence-rate and correctness properties of the pointer-jumping
  * connected-components operator (q63/q68's grouping step). The chain
  * fixture is the adversarial diameter case: plain min-label
  * propagation needs diameter rounds (63 for a 64-path), the
  * hook+compress form must stay within O(log n).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Driver-side union-find reference over the same pair list. */
  private def refComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Drives the ITERATIVE hook+compress path (localSolveMaxEdges = 0
    * disables the small-graph single-task union-find fast path) so the
    * round-count assertions measure the at-scale algorithm.
    */
  private def run(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) = Dedup.connectedComponentsWithRounds(
      pairs.toDF("doc_a", "doc_b"), localSolveMaxEdges = 0L)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache() // per the operator's cache contract
    (got, rounds)
  }

  /** The default small-graph fast path (single-task union-find). */
  private def runLocal(pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) = Dedup.connectedComponentsWithRounds(
      pairs.toDF("doc_a", "doc_b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    (got, rounds)
  }

  test("64-node chain: correct labels in <= log2(n) + 3 rounds") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val (got, rounds) = run(chain)
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
    assert(rounds <= 9, // log2(64) = 6, +1 fixpoint check, +2 slack
      s"pointer jumping must converge logarithmically on a chain; took $rounds")
  }

  test("256-node chain stays logarithmic (2 more nodes-doublings, ~2 more rounds)") {
    val chain = (1L until 256L).map(i => (i, i + 1))
    val (got, rounds) = run(chain)
    assert(got === (1L to 256L).map(_ -> 1L).toMap)
    assert(rounds <= 11, // log2(256) = 8, +1 fixpoint check, +2 slack
      s"took $rounds rounds for a 256-chain")
  }

  test("mixed graph: cliques + chain + isolated pair match union-find") {
    val clique = for {
      a <- 100L to 104L; b <- (a + 1) to 104L
    } yield (a, b)
    val chain = (200L until 216L).map(i => (i, i + 1))
    val pair = Seq((500L, 501L))
    val pairs = clique ++ chain ++ pair
    val (got, rounds) = run(pairs)
    assert(got === refComponents(pairs))
    assert(rounds <= 7, s"small mixed graph took $rounds rounds")
  }

  test("clique components still converge in the 1-2 hook rounds + fixpoint") {
    val clique = for {
      a <- 1L to 8L; b <- (a + 1) to 8L
    } yield (a, b)
    val (got, rounds) = run(clique)
    assert(got === (1L to 8L).map(_ -> 1L).toMap)
    assert(rounds <= 3)
  }

  test("small-graph fast path: single-task union-find equals the iterative labels in one round") {
    val clique = for {
      a <- 100L to 104L; b <- (a + 1) to 104L
    } yield (a, b)
    val chain = (200L until 216L).map(i => (i, i + 1))
    val pairs = clique ++ chain ++ Seq((500L, 501L))
    val (local, localRounds) = runLocal(pairs)
    val (iter, _) = run(pairs)
    assert(local === iter, "fast-path labels must equal the iterative fixpoint")
    assert(local === refComponents(pairs))
    assert(localRounds === 1, "the fast path is a single job, reported as one round")
  }

  test("fast-path threshold: graphs past localSolveMaxEdges take the iterative path") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    import spark.implicits._
    val (_, rounds) = Dedup.connectedComponentsWithRounds(
      chain.toDF("doc_a", "doc_b"), localSolveMaxEdges = 10L)
    spark.catalog.clearCache()
    assert(rounds > 1, "63 edges > 10 must run the iterative rounds")
  }
}
