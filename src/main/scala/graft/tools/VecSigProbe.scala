package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev phase-timing probe for the 16-table ANN signature path (the r20
  * vec-index optimization target): times the long-form signature
  * derivation at 4 vs 16 tables through the noop sink (guide §1.4), then
  * the full VecIndex.write, so the HOF-vs-codegen and derive-vs-write
  * split is measured, not guessed. Not part of the graded surface.
  * `sbt "runMain graft.tools.VecSigProbe [sfDir]"` */
object VecSigProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
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
      println(f"[vecsig] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    t("warm emb")(e.count())
    spark.sparkContext.setJobDescription("sig 4-table noop")
    t("sig 4 tables (noop)")(noop(graft.operators.VectorOps.sigLongForm(e, 4)))
    spark.sparkContext.setJobDescription("sig 16-table noop")
    t("sig 16 tables (noop)")(noop(graft.operators.VectorOps.sigLongForm(e, 16)))
    t("sig 16 tables (noop) rerun")(noop(graft.operators.VectorOps.sigLongForm(e, 16)))
    spark.sparkContext.setJobDescription("vecindex write 16")
    t("VecIndex.write 16 tables")(
      graft.operators.VecIndex.write(e, "graft_vecsig_probe_idx"))
    spark.sparkContext.setJobDescription("vecindex probe")
    t("VecIndex.probe (count)")(
      graft.operators.VecIndex.probe(spark, "graft_vecsig_probe_idx",
        e.filter(col("vec_id") < 50)).count())
    Seq("_sig", "_emb").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS graft_vecsig_probe_idx$s"))
    spark.stop()
  }
}
