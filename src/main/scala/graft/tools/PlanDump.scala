package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev helper: print one query's AQE-final formatted plan.
  * `sbt "runMain graft.tools.PlanDump <query> [sfDir]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
