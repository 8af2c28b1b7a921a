package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors: builds a DataFrame
  * from a custom LogicalPlan (the standard extension-library technique
  * for injecting custom operators ahead of a registered Strategy).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Executor-side page size for external sorters
    * (`MemoryManager.pageSizeBytes` is `private[spark]`).
    */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
}
