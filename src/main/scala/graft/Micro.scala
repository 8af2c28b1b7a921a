package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (NOT driver contract): decompose the multi-signal mine's
  * cost — times each internal stage of the dedup family in isolation
  * (noop sink, clearCache per pass, min of 3) so optimization targets
  * the measured hot stage instead of a guess. Mirrors Bench's local[32]
  * methodology.
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_MINPN").foreach(v =>
      spark.conf.set("spark.sql.files.minPartitionNum", v))
    spark.range(1000).selectExpr("sum(id)").collect()

    def docs: DataFrame =
      operators.Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val verbose = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    if (verbose)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val wall = (for { s <- si.submissionTime; c <- si.completionTime }
              yield (c - s) / 1e3).getOrElse(-1.0)
            val scopes = si.rddInfos.flatMap(_.scope).map(_.name)
              .filter(n => n != "WholeStageCodegen" && !n.startsWith("mapPartitions"))
              .distinct.mkString("|")
            stageLog.add(
              f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
                f"wall=$wall%6.3f taskSum=${si.taskMetrics.executorRunTime / 1e3}%6.3f " +
                si.name.take(40) + " :: " + scopes.take(200))
          }
        })

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { i =>
        if (i == 3) { Thread.sleep(300); stageLog.clear() }
        val t0 = System.nanoTime()
        try mk.write.format("noop").mode("overwrite").save()
        finally spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-34s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      if (verbose) {
        Thread.sleep(300)
        val it = stageLog.iterator()
        while (it.hasNext) println(it.next())
        stageLog.clear()
      }
    }

    time("docs_scan")(docs)
    time("tripleSigs")(operators.Dedup.tripleSigs(docs))
    time("shingledDocs_k5_proj")(docs.join(
      operators.Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      "doc_id").select(col("doc_id"), col("source"),
        call_function("graft_shingle_hashes", coalesce(col("text"), lit("")), lit(5)).as("sh")))
    val shared0 = operators.Dedup.tripleSigs(docs)
    time("minhash_pairs") {
      val shared = operators.Dedup.tripleSigs(docs)
        .transform(graft.plans.CacheLifecycle.autoRelease)
      operators.Dedup.minhashPairsFrom(shared)
    }
    time("simhash_pairs") {
      val shared = operators.Dedup.tripleSigs(docs)
        .transform(graft.plans.CacheLifecycle.autoRelease)
      operators.Dedup.simhashPairsFromSigs(shared.select(col("doc_id"), col("sh")))
    }
    time("ppjoin_pairs") {
      val shared = operators.Dedup.tripleSigs(docs)
        .transform(graft.plans.CacheLifecycle.autoRelease)
      operators.Dedup.ppjoinPairsFrom(shared.select(col("doc_id"), col("hl")))
    }
    time("multiSignalPairs")(operators.Dedup.multiSignalPairsFrom(docs))
    time("multiSignal_CC")(
      operators.Dedup.connectedComponents(operators.Dedup.multiSignalPairsFrom(docs)))
    time("minePairs_full")(operators.Dedup.minePairs(docs,
      Some(operators.Tables.embeddings(spark, dir))))
    Seq("q157_final_cut_manifest", "q31_quality_score", "q45_repetition_ratios",
      "q41_dedup_hash", "q14_nms_rank", "q30_token_stats", "q12_detections_explode")
      .foreach(q => time(q)(SparkEntry.queries(q)(spark, dir)))
    spark.stop()
  }
}
