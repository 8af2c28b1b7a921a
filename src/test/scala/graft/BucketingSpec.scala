package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join story at 100 TB: two fact tables
  * bucketed (and sorted) on the join key join WITHOUT any exchange —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join. This spec writes bucketed copies of orders and
  * lineitem and asserts the join plan is exchange-free.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft_warehouse_${java.util.UUID.randomUUID().toString.take(8)}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed prior run can leave the managed location behind with no
    // catalog entry, which CTAS then refuses to overwrite
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = new java.io.File(s"$wh/$name")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }

  test("bucketed+sorted tables join with no shuffle exchange") {
    dropTable("orders_b")
    dropTable("lineitem_b")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    // force the shuffle-join path (at this toy SF Spark would broadcast,
    // which hides exactly the exchange bucketing is there to eliminate)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        spark.table("orders_b")("o_orderkey") ===
          spark.table("lineitem_b")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(plan.contains("Bucketed: true"),
        s"scan must use bucketing:\n${plan.take(2000)}")

      // sanity: same row count as the plain join
      val expected = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
