package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump named queries as single CSVs for before/after diffing
  * when refactoring an operator. Not part of the driver contract.
  * Usage: `sbt 'runMain graft.Dump q42_minhash_lsh_pairs /root/testdata/sf0.01 /tmp/before'`.
  */
object Dump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(2).getOrElse("/tmp/graft_dump")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- names)
      SparkEntry.queries(q)(spark, dir).coalesce(1).write
        .mode("overwrite").option("header", "true").csv(s"$out/$q")
    spark.stop()
  }
}
