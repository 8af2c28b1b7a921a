package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one query steady-state (3 runs after a warm query)
  * and optionally dump its formatted plan. Not part of the driver
  * contract. Usage: `sbt 'runMain graft.Probe q51_knn_pairs
  * /root/testdata/sf0.1 --explain'`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, dir).count() // warm
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); fn(spark, dir).count()
        println(s"[probe] $q run$i: ${(System.nanoTime() - t0) / 1e9}")
      }
      if (args.contains("--explain")) fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
