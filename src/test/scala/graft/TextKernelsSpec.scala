package graft

import graft.functions.TextKernels._
import org.scalatest.funsuite.AnyFunSuite

class TextKernelsSpec extends AnyFunSuite {

  test("tokenize: whitespace runs, no empties") {
    assert(tokenize("  a  b\tc\n d ").toSeq === Seq("a", "b", "c", "d"))
    assert(tokenize("").isEmpty)
    assert(tokenize(null).isEmpty)
  }

  test("jaccard: identical=1, disjoint=0, half") {
    assert(jaccard(Set("a", "b"), Set("a", "b")) === 1.0)
    assert(jaccard(Set("a"), Set("b")) === 0.0)
    assert(jaccard(Set("a", "b", "c"), Set("b", "c", "d")) === 0.5)
  }

  test("minhash approximates jaccard (seeded property)") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 200).map(i => s"w$i")
    for (_ <- 1 to 30) {
      val base = rnd.shuffle(vocab).take(80).toSet
      // perturb ~20% of elements
      val other = base.filter(_ => rnd.nextDouble() > 0.2) ++
        rnd.shuffle(vocab).take(16)
      val exact = jaccard(base, other)
      val sa = minhash(base, 256)
      val sb = minhash(other, 256)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
      assert(math.abs(est - exact) < 0.15,
        s"minhash estimate $est vs exact $exact")
    }
  }

  test("lsh bands: identical sets share all bands, disjoint share none") {
    val a = minhash(Set("x", "y", "z"), 128)
    assert(lshBands(a, 8).toSeq === lshBands(a, 8).toSeq)
    val b = minhash((0 until 50).map(i => s"q$i").toSet, 128)
    assert(lshBands(a, 8).toSeq.intersect(lshBands(b, 8).toSeq).isEmpty)
  }

  test("simhash: similar docs are hamming-close, different docs are not") {
    val doc = (0 until 100).map(i => s"tok${i % 37}").mkString(" ")
    val similar = doc + " extra token tail"
    val different = (0 until 100).map(i => s"other${i * 3 % 53}").mkString(" ")
    assert(hammingDistance(simhash(doc), simhash(similar)) <= 8)
    assert(hammingDistance(simhash(doc), simhash(different)) > 10)
  }

  test("fingerprint: shared for identical docs, deterministic") {
    val d = "the quick brown fox jumps over the lazy dog again and again"
    assert(fingerprint(d) === fingerprint(d))
    assert(fingerprint(d) !== fingerprint(d + " shifted ending differs a lot"))
  }

  test("languageId: stopword heuristic + CJK shortcut") {
    assert(languageId("the cat is in the house and it is warm") === "en")
    assert(languageId("el perro y la casa de los amigos en un lugar") === "es")
    assert(languageId("der hund und die katze ist von den leuten") === "de")
    assert(languageId("这是一个中文句子的测试文本") === "zh")
    assert(languageId("") === "und")
  }

  test("qualityScore: ordering sanity") {
    val good = "a sensible paragraph with varied vocabulary and reasonable " +
      "length that reads like prose written by a person"
    val bad = "x x x x x x x x x x x x x x x x"
    assert(qualityScore(good) > qualityScore(bad))
    assert(qualityScore("") === 0.0)
  }

  test("hash64 is stable across calls (not object identity)") {
    assert(hash64("spark") === hash64("spark"))
    assert(hash64("spark") !== hash64("sparl"))
  }
}
