package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main replaying the zero-listing spec flow: seed upsert with
  * stats+bloom manifests, one streaming batch arrival, then the skip-reads
  * — printing the manifest renderings, file selections, and valve count at
  * each step. */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_skipprobe")
      .toString + "/t"
    val ord = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("key"), col("o_orderdate"),
        col("o_totalprice"))
    graft.sources.Sinks.upsertBatch(ord.withColumn("seq", lit(1L)),
      root, "key", "seq", statsCols = Seq("o_orderdate"), bloomCol = "key")
    val live = graft.sources.Sinks.resolveTable(spark, root)
    println("STATS: " + spark.read.parquet(s"$live/_stats")
      .select("file").collect().map(_.getString(0)).take(2).mkString(" | "))
    val batch = spark.range(2).select(
      (col("id") + 9000000L).as("key"),
      lit("1996-02-10 00:00:00").cast("timestamp").as("o_orderdate"),
      lit(42.0).as("o_totalprice"), lit(1L).as("seq"))
    graft.sources.Sinks.writeBatch(batch, root, 7L)
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1996-02-29 23:59:59").cast("timestamp")
    graft.sources.Sinks.valveListings.set(0L)
    val pruned = graft.sources.Sinks.readTableSkip(spark, root, "o_orderdate", lo, hi)
    val prunedNames = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).sorted
    println(s"PRUNED_FILES=${prunedNames.length}")
    prunedNames.foreach(n => println("  P: " + n))
    // truth side via the layout-aware table read: after the writeBatch
    // arrival this version is MIXED (root files + batch=7/), the exact
    // shape where bare spark.read.parquet silently drops the merged base
    // from partition discovery — the probe's own reference output would
    // lie (r18 finding; ADVICE r18)
    val allNames = graft.sources.Sinks.readTable(spark, root)
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).sorted
    println(s"ALL_FILES=${allNames.length}")
    allNames.foreach(n => println("  A: " + n))
    println("VALVE=" + graft.sources.Sinks.valveListings.get())
    println("N_PRUNED=" + pruned.count())
    println("N_FULL=" + graft.sources.Sinks.readTable(spark, root)
      .filter(col("o_orderdate").between(lo, hi)).count())
    spark.stop()
  }
}
