package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: phase-level timing of q_dedup_cc on a fixture dir. Run:
  *   runMain graft.tools.CcProfile /root/testdata/sf0.1 32
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.ccDebug", "true")
    if (args.length > 2) spark.conf.set("spark.sql.adaptive.enabled", args(2))
    graft.functions.SketchExprs.register(spark)
    graft.functions.VecExprs.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = graft.operators.SketchDedup.qDedupMinhash.fn(spark, sfDir)
      pairs.count()
      val t1 = System.nanoTime()
      System.err.println(f"[cc] run $i minhash pairs: ${(t1 - t0) / 1e9}%.2fs")
      val cc = graft.operators.SketchDedup.qDedupCc.fn(spark, sfDir)
      cc.count()
      System.err.println(f"[cc] run $i full q_dedup_cc: ${(System.nanoTime() - t1) / 1e9}%.2fs")
      graft.sources.Scratch.releaseAll()
    }
    spark.stop()
  }
}
