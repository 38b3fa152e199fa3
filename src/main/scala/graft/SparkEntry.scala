package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build plan). Queries are defined next to their operators in
  * graft.operators / graft.functions / graft.streaming and aggregated here.
  */
object SparkEntry {

  /** The graded inventory grouped by defining MODULE, in SURVEY §2 order.
    * Queries within one module share module-private persisted sub-DAGs
    * (SketchDedup's bitmap/band/pair tables, VectorOps' LSH/IVF signature
    * tables, ...), so a long-lived session that wants index reuse scopes
    * its scratch release to these boundaries — the Bench does exactly
    * that. Cross-module plans never share scratch (pipelines are
    * module-private `def`s), so a module boundary is always a safe
    * release point. */
  def moduleGroups: Seq[(String, Seq[Q])] = Seq(
    "scans" -> operators.Scans.all,
    "filters" -> operators.Filters.all,
    "joins" -> operators.Joins.all,
    "aggregates" -> operators.Aggregates.all,
    "reshape" -> operators.Reshape.all,
    "windows" -> operators.Windows.all,
    "sortset" -> operators.SortSet.all,
    "scalars" -> functions.Scalars.all,
    "textops" -> operators.TextOps.all,
    "textextras" -> operators.TextExtras.all,
    "corpusstats" -> operators.CorpusStats.all,
    "curation" -> operators.Curation.all,
    "pipelineops" -> operators.PipelineOps.all,
    "olapextras" -> operators.OlapExtras.all,
    "olapclassics" -> operators.OlapClassics.all,
    "sketchdedup" -> operators.SketchDedup.all,
    "graphops" -> operators.GraphOps.all,
    "vectorops" -> operators.VectorOps.all,
    "sqlsurface" -> operators.SqlSurface.all,
    "streams" -> streaming.Streams.all)

  /** Every graded query, in SURVEY §2 order. */
  def allQ: Seq[Q] = moduleGroups.flatMap(_._2)

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
