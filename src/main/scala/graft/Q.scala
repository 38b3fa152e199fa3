package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation plus (usually) a DuckDB oracle
  * SQL string over the same parquet tables. `oracle = None` marks operators
  * that are not SQL-expressible cross-engine (the driver then records a
  * weaker rows-only check); every such case must have a ScalaTest instead.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, Some(sql))
  def noOracle(name: String)(f: (SparkSession, String) => DataFrame): Q =
    Q(name, f, None)
}
