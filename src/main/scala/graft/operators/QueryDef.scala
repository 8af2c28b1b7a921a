package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin with
  * IDENTICAL column names and value semantics (driver contract in
  * /root/repo/src/main/scala/graft/Verify.scala). `oracle = None` ⇒
  * the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
