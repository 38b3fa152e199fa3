package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    RunId.ensure() // export graft.run.id before the session's first log4j use
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=q_a,q_b dumps (and lists oracles for)
    // just those queries, so scripts/crosscheck.py can iterate on one new
    // operator without a full 100+-query dump. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // Failures must be LOUD: in round 10 a broken loader made 28 queries
    // vanish from CORRECTNESS silently (stderr only, no artifact) and the
    // round read as "all green". Every failure now lands in errors.json
    // (written even when empty, so its absence means "Verify didn't run").
    var failures = List.empty[(String, String)]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
          failures ::= (name -> msg)
          System.err.println(s"[verify] $name FAILED: $msg")
        }
        // Queries are independent: drop persisted tables between them so the
        // 100+-query dump doesn't accumulate cached blocks in the driver heap.
        // releaseAll also frees checkpoint-RDD blocks (CC/rank loops), which
        // clearCache cannot see; clearCache then catches any bare persist().
        graft.sources.Scratch.releaseAll()
        spark.catalog.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures.reverse
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} FAILED: " +
          failures.reverse.map(_._1).mkString(", "))
    }
    // Exit 0 even on per-query failures: the driver must still consume the
    // successful dumps + errors.json (a non-zero rc risks the round-10
    // bench failure mode, where rc=1 discarded the entire artifact).
    spark.stop()
  }
}
