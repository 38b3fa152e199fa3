package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions}
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

  /** Declared-schema CSV source — like [[readJson]], inference is never
    * used in a prod path (CSV inference costs a full extra pass and types
    * drift between runs; a header row only names columns, it can't type
    * them). */
  def readCsv(spark: SparkSession, schema: StructType, path: String,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** CSV sink (interchange exports — parquet stays the analytic format). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.option("header", header.toString).mode(mode).csv(path)

  /** Declared-schema ORC source — the other columnar interchange format
    * warehouse estates carry; same no-inference discipline as
    * [[readJson]]/[[readCsv]]. ORC carries its own schema, but declaring
    * one pins the contract (a writer-side type drift fails loudly at read
    * time instead of propagating). */
  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed parquet table sink: rows are hash-clustered into `buckets`
    * files per partition on `bucketCols` and each bucket sorted, so a
    * later join or aggregate keyed on the bucket columns reads the table
    * already co-partitioned — no shuffle of the big side (ScaleSpec
    * proves zero exchanges on a bucketed⋈bucketed join). Bucketing
    * metadata lives in the session catalog, hence `saveAsTable` + a table
    * name rather than a bare path. */
  def writeBucketed(df: DataFrame, buckets: Int, bucketCols: Seq[String],
      table: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      // A managed table's files OUTLIVE an in-memory catalog: a fresh
      // session that re-creates the same table name fails with
      // LOCATION_ALREADY_EXISTS even in Overwrite mode, because overwrite
      // only replaces tables the current catalog knows about. Drop any
      // current registration AND any orphaned default location first so
      // the sink is idempotent across engine restarts.
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode(mode).saveAsTable(table)
  }

  /** Re-declare an existing bucketed-table artifact in a bare session
    * catalog: schema is read from the parquet files themselves (no
    * hardcoded DDL to drift) and the bucketing is re-stated, so a fresh
    * session — whose default in-memory catalog died with its predecessor —
    * can serve bucket-aware scans over the surviving directory. The
    * re-registration is EXTERNAL (explicit LOCATION): dropping it leaves
    * the data intact. Bucket files carry their bucket id in the file
    * name, which is how the re-declared table stays bucket-aware. */
  def registerBucketed(spark: SparkSession, table: String, path: String,
      bucketCols: Seq[String], buckets: Int): Unit = {
    val schema = spark.read.parquet(path).schema.toDDL
    val bc = bucketCols.mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"""CREATE TABLE `$table` ($schema) USING parquet
         |CLUSTERED BY ($bc) SORTED BY ($bc) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }

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

  /** One micro-batch of the streaming MERGE sink: upsert `batch` into the
    * keyed parquet table at `path` — the streaming twin of the
    * q_merge_upsert plan. Within the batch, latest-wins per key by
    * `seqCol`; against the table, one full outer equi-join on `keyCol`
    * where the row with the GREATER seq wins (ties go to the batch) —
    * the same single-join shape Delta/Iceberg run under streaming MERGE,
    * never a per-row lookup. The winner per key is the maximum of
    * (seq, xxhash64 of the full row) — a TOTAL order, so equal-seq rows
    * resolve deterministically instead of by arrival order. Because the
    * stored state is always that maximum, replaying ANY earlier batch
    * (in any order, any number of times) recomputes the same maximum:
    * the sink converges under arbitrary at-least-once replay.
    *
    * Durability: the merge is staged to `<path>.tmp` and swapped in via
    * filesystem delete+rename, then the stage dir is gone. A crash before
    * the delete leaves the previous table intact; the delete→rename
    * window itself is NOT atomic (two metadata ops) — a real table format
    * closes that gap with a single metadata commit, which is exactly the
    * ACID-layer non-goal documented in README. */
  def upsertBatch(batch: DataFrame, path: String, keyCol: String,
      seqCol: String): Unit = {
    val spark = batch.sparkSession
    // deterministic total order per key: (seq, xxhash64(whole row)) —
    // the hash is computed over the name-sorted column list so base and
    // batch sides hash identically regardless of physical column order
    def rowHash(cols: Seq[String], prefix: String = "") =
      functions.xxhash64(cols.sorted.map(c => functions.col(s"$prefix$c")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(functions.col(seqCol).desc, rowHash(batch.columns.toSeq).desc)
    val latest = batch
      .withColumn("__rn", functions.row_number().over(w))
      .filter(functions.col("__rn") === 1).drop("__rn")
    // table existence via the PATH's filesystem (java.io.File would read
    // the local disk even when the table lives on HDFS/S3 and silently
    // replace the base table with the bare batch)
    val tablePath = new org.apache.hadoop.fs.Path(path)
    val tableExists = tablePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(tablePath)
    val merged =
      if (!tableExists) latest
      else {
        val base = spark.read.parquet(path)
        // prefix every batch column so the full-outer join is unambiguous;
        // per key, the greater (seq, row-hash) wins — batch on exact ties
        // (identical row) and inserts
        val b = latest.columns.foldLeft(latest) { (d, c) =>
          d.withColumnRenamed(c, s"__b_$c")
        }
        val baseHash = rowHash(base.columns.toSeq)
        val batchHash = rowHash(base.columns.toSeq, "__b_")
        val batchWins = functions.col(s"__b_$keyCol").isNotNull &&
          (functions.col(keyCol).isNull ||
            functions.col(s"__b_$seqCol") > functions.col(seqCol) ||
            (functions.col(s"__b_$seqCol") === functions.col(seqCol) &&
              batchHash >= baseHash))
        base.join(b,
            functions.col(keyCol) === functions.col(s"__b_$keyCol"),
            "full_outer")
          .select(base.columns.toSeq.map { c =>
            functions.when(batchWins, functions.col(s"__b_$c"))
              .otherwise(functions.col(c)).as(c)
          }: _*)
      }
    // Stage, then swap by rename: materialize the merge fully (it reads
    // the live table, so the old dir must survive until the plan is done),
    // drop the old dir, move the stage into place. No second rewrite, no
    // leaked stage copy.
    val tmp = s"$path.tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Small-file compaction for a parquet directory: one read, one
    * `coalesce(files)` write of the same rows, staged and swapped into
    * place like [[upsertBatch]]. The streaming sinks above produce one
    * file set per micro-batch; left alone, a 100 TB table's read path
    * degrades to an open() per tiny file and the scheduler drowns in
    * splits — periodic compaction is the maintenance operator that keeps
    * scan cost proportional to bytes, not batch count. `partitionCols`
    * preserves an existing hive layout (the partition columns read back
    * as data columns and must be re-materialized as directories);
    * `coalesce` (not repartition) keeps the rewrite shuffle-free. */
  def compact(spark: SparkSession, path: String, files: Int,
      partitionCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(path).coalesce(files)
    val tmp = s"$path.compact.tmp"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Replace `dst` with the staged directory `src` (delete + rename; the
    * two-metadata-op window is the documented ACID non-goal). */
  private def swapInto(spark: SparkSession, src: String, dst: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dst)
    val fs = d.getFileSystem(hconf)
    fs.delete(d, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(src), d))
      throw new java.io.IOException(s"swapInto: rename $src -> $dst failed")
  }
}
