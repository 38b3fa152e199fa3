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

  /** One micro-batch of the exactly-once streaming parquet sink: each
    * batch owns the directory `batch=<id>` and OVERWRITES it whole. A
    * failure-replay of the same batch id (Structured Streaming's
    * at-least-once foreachBatch contract) rewrites identical contents
    * instead of appending duplicates — idempotence comes from the
    * overwrite-per-batch-directory discipline, and readers see the batch
    * id as a partition column (write lineage for free). */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode(SaveMode.Overwrite).parquet(s"$path/batch=$batchId")

  /** Exactly-once streaming parquet sink via foreachBatch — the seam a
    * production pipeline uses when the sink needs transactional behavior
    * plain file append can't give (upserts, dedup against the target,
    * multi-table fan-out all live here). */
  def foreachBatchParquet(stream: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(batch.toDF(), path, batchId)
    }
}
