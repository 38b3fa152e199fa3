package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources and sinks (SURVEY §2.1): schema-declared JSON reads and
  * partitioned parquet writes — the reference family's I/O identity
  * (`read.json` → `write.partitionBy(...).parquet`).
  *
  * Scale notes: partitionBy columns become directories, so downstream
  * readers get partition pruning for free (PlanAudit/SinkSourceSpec assert
  * the PartitionFilters show up). Writers repartition by the partition
  * columns first so each task writes one file per partition instead of
  * every task writing a sliver of every partition — at 100 TB that's the
  * difference between `files = partitions` and `files = tasks × partitions`
  * (small-file death).
  */
object Sinks {

  /** Declared-schema JSON source — inference is never used in a prod path
    * (it costs a full extra pass and can flip types between runs). */
  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet sink with per-partition file consolidation. */
  def writePartitioned(df: DataFrame, partitionCols: Seq[String], path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*).mode(mode).parquet(path)
  }

  /** Plain parquet sink (dims that don't warrant partitioning). */
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)
}
