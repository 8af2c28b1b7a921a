package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs every `SparkEntry.queries` query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Noise-robustness: this box is co-tenant (round-2 recorded a 1.5x "regression"
  * that was pure measurement noise; round 4's recorded q48 was 24.7 s vs 2.2 s
  * re-measured clean). Each query gets a cold pass (includes plan compilation +
  * any codegen) and `SPARK_GRAFT_WARM_PASSES` (default 2) steady-state passes;
  * `warm` is the MIN of the warm passes — co-tenant interference is strictly
  * additive, so the minimum is the estimator of the noise-free time (the
  * max/min ratio of the warm passes is reported per query as `spread` so a
  * polluted sample stays visible instead of silently discarded). `value` is
  * the warm total (the number comparable across rounds); `cold_total` keeps
  * one-time costs visible.
  *
  * Failure-transparency: a query that throws is recorded in `errors` with the
  * exception string — never as a fake (fast) timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup (JVM/codegen/scheduler/parquet-reader init), not
    // query work — keeps the first timed query from absorbing one-time
    // costs. Warms the parquet reader on the smallest SIBLING sf dir
    // of the bench dir when one exists (so the warmup never touches
    // the bench data); falls back to the bench dir's own smallest file.
    spark.range(1000).selectExpr("sum(id)").collect()
    val warmDir = {
      val sf = new java.io.File(sfDir)
      val siblings = Option(sf.getParentFile)
        .flatMap(p => Option(p.listFiles())) // listFiles() is null on unreadable dirs
        .getOrElse(Array.empty[java.io.File])
        .filter(d => d.isDirectory && d.getName != sf.getName &&
          new java.io.File(d, "region.parquet").exists())
      if (siblings.nonEmpty) siblings.minBy(d =>
        new java.io.File(d, "region.parquet").length()).getPath
      else sfDir
    }
    try spark.read.parquet(s"$warmDir/region.parquet").count()
    catch { case _: Throwable => () }

    def jsonEscape(s: String): String =
      s.flatMap {
        case '"'           => "\\\""
        case '\\'          => "\\\\"
        case '\n'          => "\\n"
        case '\r'          => "\\r"
        case '\t'          => "\\t"
        case c if c < ' '  => f"\\u${c.toInt}%04x"
        case c             => c.toString
      }

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // Force execution through the noop DataSourceV2 sink, NOT .count():
      // count() is rewritten to Aggregate[count(1)], after which
      // ColumnPruning drops deterministic per-row projections and
      // EliminateSorts drops orderBy — narrow scan→project queries would
      // time only the scan. The noop sink consumes every output row/column,
      // so the timed pass executes exactly the work a real consumer would.
      // clearCache in finally: queries persist() intermediate signature
      // tables, and a query that THROWS mid-action must not leak its
      // cached blocks into the next query's timed passes. Clearing per
      // pass also keeps every timed pass an honest full recompute.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    val warmPasses = sys.env.getOrElse("SPARK_GRAFT_WARM_PASSES", "2").toInt.max(1)
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Double)]
    val errors  = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val cold = timeOnce(fn)
        val warms = Seq.fill(warmPasses)(timeOnce(fn))
        timings += name -> (cold, warms.min, warms.max / warms.min)
      } catch {
        case e: Throwable =>
          errors += name -> jsonEscape(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }

    val qs = timings.map { case (k, (c, w, s)) =>
      // Double.toString is locale-independent ('.'), unlike %f formatting
      s""""$k":{"cold":$c,"warm":$w,"spread":${math.rint(s * 100) / 100}}"""
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => s""""$k":"$m"""" }.mkString("{", ",", "}")
    val warmTotal = timings.values.map(_._2).sum
    val coldTotal = timings.values.map(_._1).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","cold_total":$coldTotal,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
