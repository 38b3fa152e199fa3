package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the two `_stats` manifest builders on one staged version: the
  * FOOTER harvest (O(files) metadata reads, no data pages) vs the
  * data-scan pass (column-pruned groupBy(input_file_name) over the
  * version's bytes). Run at two SFs to show the scan cost scales with
  * data bytes while the footer cost scales with file count — the round-18
  * BASELINE evidence for the r17 `weak` #2 fix. `mult` replicates the
  * rows (cross join with a range) so the bytes-vs-files scaling separates
  * from the fixed job-launch floor at small SFs. Usage:
  * ManifestBenchProbe <sfDir> [reps=3] [mult=1] */
object ManifestBenchProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val mult = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_manifab").toString + "/v"
    graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_linestatus"))
      .crossJoin(spark.range(mult).select(col("id").as("__m"))).drop("__m")
      .repartitionByRange(16, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) {
        files += st.getPath.toString; bytes += st.getLen
      }
    }
    val schema = spark.read.parquet(dir).schema
    val cols = Seq(("l_shipdate", schema("l_shipdate").dataType))
    import scala.jdk.CollectionConverters._
    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    def footer(): Unit = {
      val infos = graft.sources.Sinks.readFooters(spark, files.toSeq, cols)
      val rows = graft.sources.Sinks.footerStatsRows(infos, cols.map(_._2))
        .getOrElse(sys.error("footer path unusable on this fixture"))
      val statsSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType) +: cols.flatMap { case (c, dt) =>
          Seq(org.apache.spark.sql.types.StructField(s"${c}_min", dt),
            org.apache.spark.sql.types.StructField(s"${c}_max", dt)) })
      spark.createDataFrame(rows.asJava, statsSchema).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/_stats_f")
    }
    def scan(): Unit =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("file"))
        .agg(min("l_shipdate").as("l_shipdate_min"),
          max("l_shipdate").as("l_shipdate_max"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/_stats_s")
    footer(); scan() // warm both paths once (codegen, fs handles)
    val f = (1 to reps).map(_ => timeMs(footer())).sorted.apply(reps / 2)
    val sc = (1 to reps).map(_ => timeMs(scan())).sorted.apply(reps / 2)
    println(f"""{"sf":"$sfDir","mult":$mult,"files":${files.size},"data_mb":${bytes / 1e6}%.1f,""" +
      f""""footer_ms":$f%.0f,"scan_ms":$sc%.0f}""")
    spark.stop()
  }
}
