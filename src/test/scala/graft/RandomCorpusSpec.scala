package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property coverage for the round-9 queries: the
  * driver corpus exercises one length/source distribution, so the
  * chunk/quantile/mix kernels are additionally driven here over an
  * adversarial synthetic corpus — token counts planted on every
  * stride boundary (1, 63, 64, 65, 111, 112, 113), a singleton
  * source, an identical probe/clone pair — and checked against
  * BigInt-exact independent recomputation (the TextKernelsSpec
  * seeded-property idiom, lifted to whole-query level through a
  * cloned SF dir, the EdgeCaseCorpusSpec harness trick).
  */
class RandomCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcSf = "/root/testdata/sf0.001"

  /** (doc_id, source, token count); text = that many vocab tokens.
    * Doc 7 gets the 160-token boundary slot; doc 23 clones its length
    * (and, via tokensOf, its exact token stream) — a probe pair with
    * cosine exactly 1.
    */
  private lazy val corpus: Seq[(Long, String, Int)] = {
    val rnd = new scala.util.Random(42)
    val boundary = Seq(1, 63, 64, 65, 111, 112, 113, 160)
    val planted = boundary.zipWithIndex.map { case (nt, i) =>
      (i.toLong, s"s${i % 4}", nt)
    }
    val rest = (boundary.length until 120).map { i =>
      (i.toLong, if (i == 119) "lone" else s"s${i % 4}",
        if (i == 23) 160 else 1 + rnd.nextInt(200))
    }
    planted ++ rest
  }

  private def tokensOf(id: Long): Seq[String] = {
    val nt = corpus.find(_._1 == id).get._3
    val base = if (id == 23L) 7L else id // doc 23 clones doc 7's text
    (0 until nt).map(j => s"w${(base * 131 + j * 7) % 23}")
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_randcorpus").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings"))
      Files.createSymbolicLink(Paths.get(s"$d/$t.parquet"),
        Paths.get(s"$srcSf/$t.parquet"))
    import spark.implicits._
    corpus.map { case (id, src, _) =>
      val text = tokensOf(id).mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def chunksOf(nt: Long): Long =
    if (nt <= 64) 1L else (nt - 64 + 47) / 48 + 1

  test("q150 stride arithmetic is exact on planted boundary lengths") {
    val got = SparkEntry.queries("q150_context_chunks")(spark, dir)
      .select("source", "n_docs", "n_chunks", "tok_mass").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exp = corpus.groupBy(_._2).map { case (src, g) =>
      src -> (g.size.toLong,
        g.map(d => chunksOf(d._3.toLong)).sum,
        g.map { d =>
          val nt = d._3.toLong
          (0L until chunksOf(nt)).map(i => math.min(64L, nt - i * 48)).sum
        }.sum)
    }
    assert(got == exp, s"got=$got\nexp=$exp")
  }

  test("q148: rank-1 everywhere hits the global min; ns>=2 tops hit the max") {
    val rows = SparkEntry.queries("q148_quantile_normalize")(spark, dir)
      .select("source", "n_docs", "min_norm", "max_norm").collect()
    val chars = corpus.map(d => tokensOf(d._1).mkString(" ").length.toLong)
    assert(rows.map(_.getLong(1)).sum == corpus.size)
    rows.foreach { r =>
      assert(r.getLong(2) == chars.min,
        s"rank-1 maps to position 0 = global min: $r")
      if (r.getLong(1) >= 2)
        // top rank r=ns maps to p = (ns-1)(N-1)/(ns-1) = N-1 = global max
        assert(r.getLong(3) == chars.max,
          s"a multi-doc source's top doc must normalize to the max: $r")
      else
        assert(r.getLong(3) == chars.min,
          s"a singleton source sits at p=0: $r")
    }
  }

  test("q149 weights and shares equal the BigInt recomputation") {
    def isqrt(n: Long): Long = math.sqrt(n.toDouble).toLong
    val counts = corpus.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rows = SparkEntry.queries("q149_temperature_mix")(spark, dir)
      .select("tau_ppm", "source", "n_docs", "w", "share_ppm").collect()
    assert(rows.length == counts.size * 3)
    val byTau = rows.groupBy(_.getLong(0))
    for ((tau, g) <- byTau) {
      val expW: Long => Long = tau match {
        case 1000000L => identity
        case 500000L  => isqrt
        case _        => n => isqrt(isqrt(n))
      }
      val tw = BigInt(counts.values.map(expW).sum)
      g.foreach { r =>
        val n = counts(r.getString(1))
        assert(r.getLong(2) == n && r.getLong(3) == expW(n), r.toString)
        val share = ((2 * BigInt(expW(n)) * 1000000 + tw) / (2 * tw)).toLong
        assert(r.getLong(4) == share, s"tau=$tau: $r vs $share")
      }
    }
  }

  test("q147: the planted verbatim clone of a probe scores cosine exactly 1") {
    val rows = SparkEntry.queries("q147_tfidf_probe_cosine")(spark, dir)
      .select("probe_id", "doc_id", "cos2_ppm").collect()
    assert(rows.nonEmpty)
    val cloneHit = rows.find(r => r.getLong(0) == 7L && r.getLong(1) == 23L)
    assert(cloneHit.isDefined,
      "an identical doc must out-rank every partial match for its probe")
    assert(cloneHit.get.getLong(2) == 1000000L,
      s"identical tf-idf vectors have cos² = 1 exactly: ${cloneHit.get}")
    assert(rows.head.getLong(2) == 1000000L,
      "the top-ranked pair must be the exact clone")
  }
}
