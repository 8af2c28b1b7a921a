package graft

import graft.functions.TextKernels
import graft.streaming.{IncrementalDedup, StreamLoadSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming incremental-ingest twin of q68: micro-batches of new
  * docs classified against a persisted sha256 + simhash-band corpus
  * index inside foreachBatch, written through the Stream-Load sink.
  * Asserted here:
  *  - streamed statuses over 3 micro-batches == the batch q68 query
  *    on the union (corp-index mode), end-to-end through the
  *    FileTransport sink files;
  *  - the store is never re-hashed: a hash-pass accumulator counts
  *    exactly one body hash per corpus + incoming doc;
  *  - continuous mode: the index grows with each classified batch, so
  *    later increments dedup against earlier ones (which batch q68,
  *    classifying only against corp, cannot see) — verified against a
  *    driver-side incremental reference.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("3 streamed micro-batches through the sink match batch q68 on the union") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val corp = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
    val nCorp = corp.count()
    val inc = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val acc = spark.sparkContext.longAccumulator("bodyHashes")
    val index = new IncrementalDedup.Index(spark, Some(acc),
      ingestClassified = false) // q68's inc-vs-corp semantics
    // the store itself is built INCREMENTALLY, in two ingest calls
    index.ingest(corp.filter(col("doc_id") % 2 === 0))
    index.ingest(corp.filter(col("doc_id") % 2 =!= 0))
    assert(acc.value === nCorp, "bootstrap must hash each corpus doc once")

    val sinkDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "incdedup_sink_")
      .toAbsolutePath.toString
    val mem = MemoryStream[(Long, String)](spark)
    val query = IncrementalDedup.attach(
      mem.toDF().toDF("doc_id", "text"), index,
      StreamLoadSink.StreamLoadConfig(labelPrefix = "incdedup"),
      new StreamLoadSink.FileTransport(sinkDir))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "incdedup_ckpt_").toString)
      .start()
    try {
      inc.grouped((inc.length + 2) / 3).foreach { batch =>
        mem.addData(batch.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    assert(acc.value === nCorp + inc.length,
      "each incoming doc hashed exactly once; store never re-hashed")

    // read the classifications back OUT OF THE SINK FILES — the full
    // pipeline including the labeled stream-load path is under test
    val got = spark.read
      .schema("doc_id LONG, status STRING, match_id LONG")
      .json(s"$sinkDir/*.jsonl")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    val expected = SparkEntry.queries("q68_incremental_ingest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got === expected)
    index.close()
    spark.catalog.clearCache()
  }

  test("continuous mode: later batches dedup against earlier increments") {
    import spark.implicits._
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

    val corpText1 = (0 until 30).map(i => s"alpha$i").mkString(" ")
    val corpText2 = (0 until 30).map(i => s"beta$i").mkString(" ")
    // deterministically find a single-token edit of corpText1 whose
    // simhash lands within hamming <= 3 (sha differs, so the exact
    // pass misses and the band path must catch it)
    val base = TextKernels.simhash(corpText1, 2)
    val nearText = (0 until 1000).iterator.map { j =>
      ((0 until 30).map(i => if (i == 15) s"zq$j" else s"alpha$i")).mkString(" ")
    }.find { t =>
      val d = java.lang.Long.bitCount(TextKernels.simhash(t, 2) ^ base)
      d >= 1 && d <= 3
    }.getOrElse(fail("no near variant found within hamming 3"))

    val freshA = (0 until 30).map(i => s"gamma$i").mkString(" ")
    val freshB = (0 until 30).map(i => s"delta$i").mkString(" ")
    val corpus = Seq((1L, corpText1), (2L, corpText2))
    val batch1 = Seq((101L, corpText1), (102L, freshA))
    val batch2 = Seq((201L, freshA), (202L, nearText), (203L, freshB))

    // driver-side incremental reference (independent implementation)
    val store = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    corpus.foreach { case (id, t) => store += ((id, sha(t), TextKernels.simhash(t, 2))) }
    def classifyRef(batch: Seq[(Long, String)]): Seq[(Long, String, Option[Long])] = {
      val out = batch.map { case (id, t) =>
        val (h, s) = (sha(t), TextKernels.simhash(t, 2))
        val ex = store.filter(_._2 == h).map(_._1).minOption
        val near = store
          .filter(e => java.lang.Long.bitCount(e._3 ^ s) <= 3).map(_._1)
          .minOption
        if (ex.isDefined) (id, "exact", ex)
        else if (near.isDefined) (id, "near", near)
        else (id, "novel", None)
      }
      batch.foreach { case (id, t) =>
        store += ((id, sha(t), TextKernels.simhash(t, 2)))
      }
      out
    }
    val expected1 = classifyRef(batch1)
    val expected2 = classifyRef(batch2)
    // the fixture exercises the growth: 201 must match 102 (an
    // EARLIER INCREMENT, invisible to batch q68), 202 the near path
    assert(expected1.map(e => (e._1, e._2)) ===
      Seq((101L, "exact"), (102L, "novel")))
    assert(expected2 === Seq((201L, "exact", Some(102L)),
      (202L, "near", Some(1L)), (203L, "novel", None)))

    val index = new IncrementalDedup.Index(spark, None, ingestClassified = true)
    index.ingest(corpus.toDF("doc_id", "text"))
    def classify(batch: Seq[(Long, String)]): Seq[(Long, String, Option[Long])] =
      index.classifyAndIngest(batch.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1).toSeq
    assert(classify(batch1) === expected1)
    assert(classify(batch2) === expected2)
    index.close()
    spark.catalog.clearCache()
  }
}
