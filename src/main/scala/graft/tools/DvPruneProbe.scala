package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence for file-pruned deletion-vector reads (VERDICT r19 #4):
  * on a date-clustered table with a growing deleted fraction held BELOW
  * the compaction threshold, time a NARROW skip-read (one month of 84)
  * as total deletes grow. With the un-pruned DV path the probe cost
  * tracked TOTAL deletes (the whole vector set was distinct'd and
  * anti-joined on every read); with the scanned-file pre-filter it
  * tracks the files the month actually selects, so the curve should
  * stay ~flat while the table's delete volume multiplies. Readings land
  * in BASELINE.md. `sbt "runMain graft.tools.DvPruneProbe [sfDir]"` */
object DvPruneProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dvprune").toString
    val root = s"$tmp/t"
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("key"), col("o_orderdate"),
        col("o_totalprice"))
    graft.sources.Sinks.upsertBatch(ord.withColumn("seq", lit(1L)),
      root, "key", "seq", statsCols = Seq("o_orderdate"))
    // cluster into many files so the narrow month selects a small subset
    graft.sources.Sinks.optimizeClustered(spark, root, 40, Seq("o_orderdate"))
    val lo = lit("1996-03-01 00:00:00").cast("timestamp")
    val hi = lit("1996-03-31 23:59:59").cast("timestamp")
    def timeNarrow(): Double = {
      val t0 = System.nanoTime()
      graft.sources.Sinks.readTableSkip(spark, root, "o_orderdate", lo, hi)
        .agg(count(lit(1)), sum("o_totalprice")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    timeNarrow() // warm the read path once, untimed
    println(f"[dvprune] deletes=0%% narrow-month skip read: ${timeNarrow()}%.2f s")
    // grow the deleted fraction in steps spread uniformly over ALL files
    // (key mod — every file holds deleted positions), staying below a
    // 0.25 fold threshold the whole time
    Seq(20, 10, 7).zipWithIndex.foreach { case (m, i) =>
      graft.sources.Sinks.deleteWhere(spark, root, col("key") % m === 0)
      val frac = graft.sources.Sinks.deletedFraction(spark, root)
      val t = (1 to 3).map(_ => timeNarrow()).min
      println(f"[dvprune] step=${i + 1} deleted_fraction=$frac%.3f " +
        f"narrow-month skip read (best of 3): $t%.2f s")
    }
    spark.stop()
  }
}
