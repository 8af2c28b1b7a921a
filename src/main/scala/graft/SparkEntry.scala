package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the operator modules; each module
  * colocates the Spark implementation with its DuckDB oracle twin
  * (QueryDef). Column names match between the two by construction —
  * the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    Relational.defs ++ VideoAnalytics.defs ++ TextAnalysis.defs ++
      Dedup.defs ++ Similarity.defs ++ Pipeline.defs ++ Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.find(_.name == "q02_revenue_by_nation").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
