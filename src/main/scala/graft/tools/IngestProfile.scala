package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex
import graft.sources.Tables

/** Dev phase-timing probe for the q_dedup_ingest composition: seed write +
  * three ingest cycles, each phase wall-clocked separately so optimization
  * effort lands where the time actually goes. Not part of the graded
  * surface. `sbt "runMain graft.tools.IngestProfile [sfDir]"` */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ingestprof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // per-job anatomy: which Spark jobs a cycle runs and what each costs —
    // fixed job-count overhead vs real join work is the optimization fork
    if (args.length > 1 && args(1) == "jobs") {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, System.nanoTime()); ()
          }
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val d = (System.nanoTime() - starts.getOrDefault(je.jobId, 0L)) / 1e9
            println(f"[ingestprof]   job ${je.jobId}%3d ${d}%6.2f s")
          }
        })
    }
    // A/B knobs: `noaqe` disables adaptive execution (per-stage job
    // scheduling overhead on tiny per-cycle frames), `sp8` narrows the
    // shuffle width to the bucket count. Since round 19 the engine PINS
    // both inside every ingest cycle (DedupIndex.withCycleConf), which
    // would make these knobs inert — export SPARK_GRAFT_NO_CYCLE_PIN=1
    // (sbt: add it to `run / envVars`) to measure the unpinned baseline.
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (args.contains("sp8")) spark.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "lang")
    t("warm docs")(docs.count())
    t("seed write")(
      DedupIndex.write(docs.filter(col("doc_id") % 5 <= 1), "graft_prof_idx"))
    val out = java.nio.file.Files.createTempDirectory("graft_prof").toString
    Seq(2, 3, 4).zipWithIndex.foreach { case (m, i) =>
      t(s"cycle $i")(
        DedupIndex.ingestBatch(docs.filter(col("doc_id") % 5 === m),
          "graft_prof_idx", out, i.toLong))
    }
    t("readback agg")(
      spark.read.parquet(out).groupBy("batch", "lang").count().collect())
    Seq("_bands", "_tokens").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_prof_idx$s"))
    spark.stop()
  }
}
