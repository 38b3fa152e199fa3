package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT-r16 item 6 probe: the dedup-index stripe (q_dedup_ingest,
  * q_dedup_substring, q_dedup_index_compact, q_dedup_containment) read
  * ~2x slower in the r16 DRIVER bench than r15 with flat reruns — the
  * same first-run/contention attribution class the vec stripe settled in
  * r15/r16. This runs each row SOLO (cold scratch, fresh caches) and
  * then IN-MODULE (its whole module in Bench order, shared scratch,
  * release at the module boundary — the Bench discipline), so the
  * solo-vs-in-module delta separates "the query got slower" from "the
  * stripe inherits module/bench context". Numbers land in BASELINE.md.
  */
object DedupStripeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q_dedup_ingest", "q_dedup_substring",
      "q_dedup_index_compact", "q_dedup_containment")
    def run(q: graft.Q): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      graft.sources.Scratch.releaseAll(); spark.catalog.clearCache()
    }
    val byName = graft.SparkEntry.allQ.map(q => q.name -> q).toMap
    println(s"[stripe] sf=$dir cpus=$cpus")
    for (name <- targets) {
      reset()
      val t = run(byName(name))
      println(f"[stripe] SOLO $name%-24s ${t}%.2f s")
    }
    for ((mod, qs) <- graft.SparkEntry.moduleGroups
         if qs.exists(q => targets.contains(q.name))) {
      reset()
      val t0 = System.nanoTime()
      for (q <- qs) {
        val t = run(q)
        if (targets.contains(q.name))
          println(f"[stripe] INMOD($mod) ${q.name}%-24s ${t}%.2f s")
      }
      println(f"[stripe] module $mod total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    reset()
    spark.stop()
  }
}
