package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (NOT driver contract): per-query measurement beyond wall
  * time — formatted-plan dump plus scheduler-level counters (jobs,
  * stages, tasks, summed task time, shuffle bytes) from a
  * SparkListener, the guide-§1 "where does the time go" breakdown.
  *
  * Usage:
  *   sbt 'runMain graft.Meter <sfDir> <outDir> <suffix> [q1,q2|all]'
  * writes <outDir>/<query>_<suffix>.txt (formatted plan) and prints
  * one metrics line per query. The timed pass mirrors Bench (noop
  * sink + clearCache); counters cover construction + the noop action.
  */
object Meter {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("plans/r12")
    val suffix = args.lift(2).getOrElse("before")
    val only: Option[Set[String]] =
      args.lift(3).filter(_ != "all").map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = e.stageInfo
        shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (e.taskMetrics != null) taskMs += e.taskMetrics.executorRunTime
      }
    })

    // session warmup, mirrors Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        // warm pass (codegen/plan caches), uncounted
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        finally spark.catalog.clearCache()
        Thread.sleep(200) // let async listener events drain
        val (j0, s0, t0, m0, w0, r0) = (jobs, stages, tasks, taskMs, shufWrite, shufRead)
        val t = System.nanoTime()
        val df =
          try { val d = fn(spark, dir); d.write.format("noop").mode("overwrite").save(); d }
          finally spark.catalog.clearCache()
        val wall = (System.nanoTime() - t) / 1e9
        Thread.sleep(200)
        println(f"[meter] $name wall=$wall%.3f jobs=${jobs - j0} stages=${stages - s0} " +
          f"tasks=${tasks - t0} taskSec=${(taskMs - m0) / 1e3}%.2f " +
          f"shufWriteMB=${(shufWrite - w0) / 1e6}%.1f shufReadMB=${(shufRead - r0) / 1e6}%.1f")
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$out/${name}_$suffix.txt", "UTF-8")
        try w.println(plan) finally w.close()
      } catch {
        case e: Throwable => println(s"[meter] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
