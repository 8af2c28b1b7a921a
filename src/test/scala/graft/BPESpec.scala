package graft

import graft.operators.BPE
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer (operators/BPE): merge-list exactness against a
  * hand-derived corpus, greedy left-to-right fold semantics,
  * determinism under repartitioning, early exhaustion, and
  * encode/fit kernel agreement.
  */
class BPESpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.toDF("text")
  }

  /** wc = {aaab: 3, aab: 2, low: 1, lower: 1} — worked by hand:
    * round 1: (a,a) w = 2·3 + 1·2 = 8 wins
    * round 2: aaab → [aa,a,b], aab → [aa,b]; (a,b) and (aa,a) tie at
    *          w = 3, left "a" < "aa" → (a,b) wins
    * round 3: aaab → [aa,ab], aab → [aa,b]; (aa,ab) w = 3 wins
    */
  private def corpus: DataFrame =
    docs("aaab aaab aab x", "aaab low lower aab")

  test("merge list matches the hand-derived BPE run, in rank order") {
    val rules = BPE.fit(corpus, 3).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(rules === Seq(
      (1, "a", "a", "aa", 8L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("merge fold is greedy left-to-right non-overlapping") {
    // "aaa" under (a,a) must yield [aa, a], never [a, aa]
    val rules = BPE.fit(docs("aaa aaa"), 1)
    val enc = BPE.encode(docs("aaa aaa"), rules)
      .filter(col("tok") === "aaa")
      .select(col("syms")).head.getSeq[String](0)
    assert(enc === Seq("aa", "a"))
  }

  test("merge list is deterministic at any partition count") {
    val texts = (0 until 97).map(i =>
      s"tok${i % 7} banana bandana ana${i % 3} nan")
    def run(parts: Int): Seq[String] = {
      import spark.implicits._
      val d = texts.toDF("text").repartition(parts)
      BPE.fit(d, 6).orderBy("rank")
        .collect().map(r => s"${r.getInt(0)}:${r.getString(3)}").toSeq
    }
    val a = run(1)
    assert(a.size === 6)
    assert(a === run(7))
    assert(a === run(32))
  }

  test("trainer stops early when the vocabulary runs out of pairs") {
    // single word "ab": rank 1 merges it whole; no pairs remain
    val rules = BPE.fit(docs("ab ab ab"), 5)
    assert(rules.collect().map(_.getString(3)).toSeq === Seq("ab"))
  }

  test("tie-break is (weight DESC, left ASC, right ASC)") {
    // "ba" and "ab" both appear twice; "ab" < "ba" lexicographically
    val rules = BPE.fit(docs("ab ba", "ab ba"), 1)
    val r = rules.head
    assert((r.getString(1), r.getString(2)) === ("a", "b"))
  }

  test("encode applies all rules in rank order with the fit kernel") {
    val rules = BPE.fit(corpus, 3)
    val enc = BPE.encode(corpus, rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc("aaab") === Seq("aaab"))
    assert(enc("aab") === Seq("aa", "b"))
    assert(enc("low") === Seq("l", "o", "w"))
    // 1-char words pass through encode unscathed
    assert(enc("x") === Seq("x"))
  }

  test("pair weights count word occurrences, not distinct words") {
    // "cd" appears 5 times → (c,d) w = 5
    val rules = BPE.fit(docs("cd cd cd", "cd cd"), 1)
    val r = rules.head
    assert((r.getString(1), r.getString(2), r.getLong(4)) === ("c", "d", 5L))
  }
}
