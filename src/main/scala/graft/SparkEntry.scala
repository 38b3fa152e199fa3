package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build plan). Queries are defined next to their operators in
  * graft.operators / graft.functions / graft.streaming and aggregated here.
  */
object SparkEntry {

  /** Every graded query, in SURVEY §2 order. */
  def allQ: Seq[Q] =
    operators.Scans.all ++ operators.Filters.all ++ operators.Joins.all ++
      operators.Aggregates.all ++ operators.Reshape.all ++
      operators.Windows.all ++
      operators.SortSet.all ++ functions.Scalars.all ++
      operators.TextOps.all ++ operators.TextExtras.all ++
      operators.CorpusStats.all ++
      operators.Curation.all ++ operators.PipelineOps.all ++
      operators.OlapExtras.all ++ operators.OlapClassics.all ++
      operators.SketchDedup.all ++ operators.GraphOps.all ++
      operators.VectorOps.all ++ operators.SqlSurface.all ++
      streaming.Streams.all

  /** Flagship query (Q13 pricing summary) on sf0.001; driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.q13.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    * (those are covered by ScalaTest instead). */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
