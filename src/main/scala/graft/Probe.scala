package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one query steady-state (3 runs after a warm query)
  * and optionally dump its formatted plan. Not part of the driver
  * contract. Usage: `sbt 'runMain graft.Probe q51_knn_pairs
  * /root/testdata/sf0.1 --explain'`.
  *
  * By default runs light (local[4], count() consumer) for quick
  * relative iteration. `--bench` mirrors the driver's Bench harness —
  * local[32] (or SPARK_GRAFT_CPUS), noop-sink forcing, clearCache per
  * pass — because the two bases diverge per query (small queries ~2x
  * faster under 32 threads, stage-heavy ones ~2x slower): use
  * `--bench` numbers when iterating against a bench_ref.json target.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val bench = args.contains("--bench")
    val cpus =
      if (bench) sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") else "4"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def consume(q: String): Unit = {
      val df = SparkEntry.queries(q)(spark, dir)
      if (bench)
        try df.write.format("noop").mode("overwrite").save()
        finally spark.catalog.clearCache()
      else df.count()
    }
    consume("q01_pricing_summary") // warm
    for (q <- names) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); consume(q)
        println(s"[probe] $q run$i: ${(System.nanoTime() - t0) / 1e9}")
      }
      if (args.contains("--explain"))
        SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
