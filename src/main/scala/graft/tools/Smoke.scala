package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.sources.Tables

/** Dev smoke runner: mirrors the driver's t1 check (entry rows > 0) and
  * exercises the events ns-timestamp loader. Not part of the graded
  * surface; kept so every session can re-prove the harness in one command:
  * `sbt "runMain graft.tools.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println(s"[smoke] entry schema: ${e.schema.simpleString}")
    val rows = e.collect()
    println(s"[smoke] entry rows: ${rows.length}")
    rows.take(3).foreach(r => println(s"[smoke]   $r"))
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    println(s"[smoke] events schema: ${ev.schema.simpleString}")
    println(s"[smoke] events count: ${ev.count()}")
    ev.orderBy("event_id").show(3, truncate = false)
    spark.stop()
  }
}
