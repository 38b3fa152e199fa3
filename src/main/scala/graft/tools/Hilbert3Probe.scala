package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: split q_layout_hilbert3_skip's cost into its three
  * phases (keying+clustered write, manifest, skip-read) and check the
  * keying plan stayed a linear projection chain (no CollapseProject
  * expression blow-up). */
object Hilbert3Probe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeMs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    val xyz = graft.sources.Tables.orders(spark, sfDir)
      .select((col("o_custkey") % 256).as("x"),
        (datediff(to_date(col("o_orderdate")), lit("1992-01-01")) % 256).as("y"),
        (col("o_orderkey") % 256).as("z"),
        col("o_totalprice"))
    val keyed = graft.operators.PipelineOps.withHilbert3(xyz)
    // plan size sanity: the analyzed plan's total expression node count
    val planStr = keyed.queryExecution.optimizedPlan.toString
    println(s"optimized plan chars: ${planStr.length}, lines: ${planStr.linesIterator.size}")
    val tKeyOnly = timeMs(keyed.selectExpr("sum(hkey3)").collect())
    println(f"key-compute only: $tKeyOnly%.0f ms")
    val table = graft.operators.Scans.rtTable("h3probe")
    val tWrite = timeMs(
      graft.sources.Sinks.writeClustered(keyed, 16, Seq("hkey3"), table))
    val tStats = timeMs(
      graft.operators.PipelineOps.statsWriteIndex(spark, table, Seq("x", "y", "z")))
    val tRead = timeMs(
      graft.operators.PipelineOps.zSkipScan3(spark, table, 32, 95, 64, 127, 0, 127)
        .groupBy().count().collect())
    println(f"write: $tWrite%.0f ms  stats: $tStats%.0f ms  skipread: $tRead%.0f ms")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `${table}_stats`")
    spark.stop()
  }
}
