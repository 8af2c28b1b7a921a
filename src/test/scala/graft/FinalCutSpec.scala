package graft

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q157's final-cut waterfall and q158's perceptual-hash dedup — the
  * round-12 additions. The waterfall test constructs one doc per gate
  * and pins first-failing-gate attribution (a contaminated non-keeper
  * must fall at decontamination, never surface as `dup`); the phash
  * tests pin the kernel's bit packing and the band join's pigeonhole
  * guarantee (hamming ≤ 3 found through any shared band; hamming 4
  * candidates generated but rejected by the verify).
  */
class FinalCutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ── q157 ────────────────────────────────────────────────────────

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  // first 12 tokens copied from the eval doc: 8 of 36 distinct
  // 5-gram shingles contained (22% ≥ 20%) → DIRECT contamination,
  // but far from a near-dup of it (shingle J = 8/64).
  private val partialCopy =
    ((1 to 12).map(i => s"w$i") ++ (13 to 40).map(i => s"a$i")).mkString(" ")
  // shares only the NON-eval suffix with partialCopy: 0 eval shingles
  // (not direct), shingle J with partialCopy = 24/48 = 0.5 → a ppjoin
  // edge → a neighbor of the contaminated component.
  private val paraphrase =
    ((1 to 12).map(i => s"b$i") ++ (13 to 40).map(i => s"a$i")).mkString(" ")
  private val other = (1 to 40).map(i => s"p$i").mkString(" ")
  private val repetitive = Seq.fill(41)("a").mkString(" ")
  private val unique = (1 to 40).map(i => s"u$i").mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "src0", base),         // the eval doc (seed)
      (10L, "src1", partialCopy), // 22% shingle containment → direct
      (11L, "src1", paraphrase),  // near-dup neighbor, not direct
      (12L, "src1", other),      // keeper of {12,13}
      (13L, "src1", other),      // exact dup, non-keeper
      (14L, "src1", repetitive), // Gopher bigram-repetition fail
      (15L, "src1", unique)      // survives every gate
    ).toDF("doc_id", "source", "text")
  }

  test("q157: first-failing-gate attribution and conservation") {
    val rows = Dedup.finalCutManifestFrom(corpus).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet == Set("src1"), s"eval source must not appear: ${bySrc.keySet}")
    val byStatus = rows.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3))).toMap
    // 10 (direct) + 11 (neighbor; ALSO a non-keeper of the component
    // {1,10,11} — decontamination must win the attribution)
    assert(byStatus("contaminated")._1 == 2L, byStatus.toString)
    // only 13 (non-keeper of {12,13}); 10/11 must NOT land here
    assert(byStatus("dup")._1 == 1L, byStatus.toString)
    assert(byStatus("low_quality")._1 == 1L, byStatus.toString)
    val kept = byStatus.collect {
      case (s, (n, _)) if s.startsWith("kept_") => n }.sum
    assert(kept == 2L, byStatus.toString) // 12 and 15
    assert(rows.map(_.getLong(2)).sum == 6L) // every src1 doc, once
    // token conservation: tokens sum to the corpus mass, ppm to ~1e6
    assert(rows.map(_.getLong(3)).sum == 40L * 5 + 41)
    val ppm = rows.map(_.getLong(4)).sum
    assert(ppm >= 999997L && ppm <= 1000003L, s"ppm=$ppm")
  }

  test("q156/q157: both probe/gate shapes produce identical results (r12)") {
    // gate = 0 forces the OVER-gate shapes everywhere: the explode +
    // plain equi-join contamination probe (instead of the sorted-
    // overlap merge against the one-row eval array) and un-hinted
    // equi-joins at every gatedBroadcastAt site. Results must be
    // byte-identical to the default (under-gate, broadcast) shapes —
    // the r12 probe rewrite is a plan change only.
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(Dedup.finalCutManifestFrom(corpus)) ==
      canon(Dedup.finalCutManifestFrom(corpus, gate = 0L)))
    assert(canon(Dedup.dupAwareDecontaminationFrom(corpus)) ==
      canon(Dedup.dupAwareDecontaminationFrom(corpus, gate = 0L)))
  }

  // ── q158 ────────────────────────────────────────────────────────

  test("phashBands: histogram bit packing") {
    import spark.implicits._
    val media = Seq(
      // all-zero payload: only bin 0 over-represented → b0 bit 0
      Multimodal.MediaRow(1L, "image", Array.fill(512)(0.toByte),
        1, 1, "jpeg"),
      // alternating 0x00/0xFF: bins 0 and 63 → b0 bit 0, b3 bit 15
      Multimodal.MediaRow(2L, "image",
        Array.tabulate(512)(i => if (i % 2 == 0) 0.toByte else 0xFF.toByte),
        1, 1, "jpeg")
    ).toDS()
    val sigs = Multimodal.phashBands(media).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(sigs(1L) == ((1, 0, 0, 0)), sigs.toString)
    assert(sigs(2L) == ((1, 0, 0, 0x8000)), sigs.toString)
  }

  test("phashClusters: merges through hamming ≤ 3, rejects hamming 4") {
    import spark.implicits._
    val sigs = Seq(
      // chain: 1↔3 ham 1, 3↔4 ham 2, 1↔4 ham 3 → one cluster {1,2,3,4}
      (1L, "image", 1, 0, 0, 0),
      (2L, "image", 1, 0, 0, 0), // exact sig dup of 1
      (3L, "audio", 3, 0, 0, 0),
      (4L, "image", 0xF, 0, 0, 0),
      // 5↔6 differ by 4 bits in band 0 (share bands 1-3 → candidate
      // IS generated; the verify must reject it)
      (5L, "video", 0xFF00, 0xFF00, 0xFF00, 0xFF00),
      (6L, "video", 0xFF0F, 0xFF00, 0xFF00, 0xFF00)
    ).toDF("media_id", "kind", "b0", "b1", "b2", "b3")
    val out = Multimodal.phashClusters(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, 2L),  // rep 1: media {1,2,3,4}, sigs {1,3,F}, kinds {image,audio}
      (5L, 1L, 1L, 1L),
      (6L, 1L, 1L, 1L)), out.mkString(", "))
  }

  test("phashClusters: hot-band cap drops the degenerate bucket, keeps cold-band merges") {
    import spark.implicits._
    // all four sigs share band 3 = 0 — the degenerate bucket (size 4
    // > cap 3). Sigs 1/2 also share cold bands 0 and 2 and are ham 1
    // apart: their merge must SURVIVE the cap (routes through a cold
    // band). Sigs 3/4 are ham 3 apart but share ONLY the hot band:
    // under the cap they stay singletons — the documented recall
    // trade — while the uncapped control merges them.
    val sigs = Seq(
      (1L, "image", 7, 1, 5, 0),
      (2L, "image", 7, 3, 5, 0),
      (3L, "image", 0x100, 0x200, 0x400, 0),
      (4L, "image", 0x101, 0x201, 0x401, 0)
    ).toDF("media_id", "kind", "b0", "b1", "b2", "b3")
    val capped = Multimodal.phashClusters(sigs, maxBucket = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)),
      capped.mkString(", "))
    val free = Multimodal.phashClusters(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(free.toSeq == Seq((1L, 2L), (3L, 2L)), free.mkString(", "))
  }

  test("q158 over the synthetic media table: 5 scene classes dominate") {
    val out = SparkEntry.queries("q158_media_phash_dedup")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 1000 media over 5 scene classes with shifted histograms: the
    // big clusters must cover most media, and conservation holds
    assert(out.map(_._2).sum == 1000L, out.take(10).mkString(", "))
    assert(out.take(5).map(_._2).sum >= 900L,
      s"scene clusters too fragmented: ${out.take(10).mkString(", ")}")
  }
}
