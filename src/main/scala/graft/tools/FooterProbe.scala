package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run the commit-time footer-stats harvest
  * ([[graft.sources.Sinks.readFooters]]) against a version dir and print
  * what each file's footer yielded — the tool to answer "why did this
  * commit fall back to the data-scan stats pass?" without adding log
  * noise to the hot path. Usage: FooterProbe <dir> <col:type>[,...] */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure()
    val Array(dir, colSpec) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = colSpec.split(",").toSeq.map { cs =>
      val Array(c, t) = cs.split(":")
      (c, org.apache.spark.sql.types.DataType.fromDDL(t))
    }
    val files = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val p = it.next().getPath
        val rel = p.toUri.getPath.stripPrefix(root.toUri.getPath)
        val hidden = rel.split("/").exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
        if (!hidden && p.getName.endsWith(".parquet")) buf += p.toString
      }
      buf.toSeq
    }
    println(s"files: ${files.size}")
    val infos = graft.sources.Sinks.readFooters(spark, files, cols)
    infos.foreach { fi =>
      println(s"${fi.file} rows=${fi.rows} cells=" + fi.cells.map(c =>
        s"(ok=${c.ok} has=${c.hasVal} l=[${c.lmin},${c.lmax}] d=[${c.dmin},${c.dmax}])")
        .mkString(" "))
    }
    val rows = graft.sources.Sinks.footerStatsRows(infos, cols.map(_._2))
    println(s"footerStatsRows: ${rows.map(_.size)}")
    spark.stop()
  }
}
