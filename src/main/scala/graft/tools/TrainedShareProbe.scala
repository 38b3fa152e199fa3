package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT-r15 item 1 probe: does the persisted-index writer's
  * trainedCells input plan canonicalize to the same plan as the
  * in-memory chain's, so the Lloyd round's persistScratch is shared
  * across the vec module's bench pass instead of computed twice?
  * Prints sameResult for the two input shapes and for the derived tcv
  * frames, then times trainedCells reuse through the CacheManager.
  */
object TrainedShareProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Shape A: ivfpqTrainedTop5's input
    val a = graft.operators.VectorOps.probeCleanEmb(spark, dir)
      .select(col("vec_id"), col("embedding"))
    // Shape B: ivfpqTrainedWrite's input (full frame, then 2-col select)
    val b = graft.operators.VectorOps.probeCleanEmb(spark, dir)
      .select("vec_id", "embedding")

    println(s"[probe] input sameResult = " +
      a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed))

    val (tcvA, _) = graft.operators.VectorOps.probeTrainedCells(a)
    graft.sources.Scratch.releaseAll()
    val (tcvB, _) = graft.operators.VectorOps.probeTrainedCells(b)
    println(s"[probe] tcv sameResult = " +
      tcvA.queryExecution.analyzed.sameResult(tcvB.queryExecution.analyzed))

    // Timing: materialize chain A, then chain B; if the cache is shared
    // B's tcv resolves to A's InMemoryRelation and costs ~0.
    graft.sources.Scratch.releaseAll()
    val t0 = System.nanoTime()
    val (tA, gA) = graft.operators.VectorOps.probeTrainedCells(a)
    tA.count(); gA.count()
    val dA = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (tB, gB) = graft.operators.VectorOps.probeTrainedCells(b)
    tB.count(); gB.count()
    val dB = (System.nanoTime() - t1) / 1e9
    println(f"[probe] first trainedCells $dA%.2f s, second $dB%.2f s " +
      "(second ~0 => CacheManager shared the Lloyd round)")
    graft.sources.Scratch.releaseAll()
    spark.stop()
  }
}
