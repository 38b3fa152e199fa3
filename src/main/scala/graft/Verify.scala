package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Rewrite every TimestampType (tz-aware instant) in a schema to
    * TimestampNTZType, recursing through arrays/structs/maps.
    *
    * Why: round 18 set spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS
    * (the footer-stats harvest needs annotated INT64 min/max, not stat-less
    * INT96), which made every TimestampType output column write
    * isAdjustedToUTC=true. That reads back in arrow as timestamp[us, tz=UTC]
    * while the DuckDB oracle emits naive TIMESTAMP — 13 rows regressed on the
    * driver's tz-aware schema+hash compare with bit-identical values
    * (VERDICT r18 §what's-wrong #1). The session TZ is pinned UTC on both
    * engines, so casting to NTZ is value-preserving: the written µs are
    * bit-identical, only the annotation flips to isAdjustedToUTC=false. */
  private def ntzType(dt: DataType): DataType = dt match {
    case TimestampType       => TimestampNTZType
    case ArrayType(e, n)     => ArrayType(ntzType(e), n)
    case MapType(k, v, n)    => MapType(ntzType(k), ntzType(v), n)
    case StructType(fields)  =>
      StructType(fields.map(f => f.copy(dataType = ntzType(f.dataType))))
    case other               => other
  }
  def ntzNormalize(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      val want = ntzType(f.dataType)
      // backtick-quote (escaping embedded backticks) so a top-level column
      // whose name contains a dot can't misparse as a struct path
      val ref = col("`" + f.name.replace("`", "``") + "`")
      if (want == f.dataType) d else d.withColumn(f.name, ref.cast(want))
    }
  /** Post-dump tripwire (VERDICT r18 next-round #3): read the written parquet
    * footers back and reject any timestamp annotated isAdjustedToUTC=true —
    * the engine's own output gets the fixture-drift-tripwire treatment so the
    * next session-conf change can't silently re-break the driver's schema
    * check. Returns the offending column names (empty = clean). */
  def utcAnnotated(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          schema.getColumns.asScala.toSeq.flatMap { cd =>
            Option(cd.getPrimitiveType.getLogicalTypeAnnotation).collect {
              case ts: TimestampLogicalTypeAnnotation if ts.isAdjustedToUTC =>
                cd.getPath.mkString(".")
            }
          }
        } finally reader.close()
      }.distinct
  }
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
        try {
          ntzNormalize(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val bad = utcAnnotated(spark, s"$outDir/$name")
          if (bad.nonEmpty)
            // LOUD, like every other Verify failure: a tz-annotated output
            // column is exactly the r18 13-row regression shape.
            failures ::= (name -> s"tz-annotated timestamp in output: ${bad.mkString(",")}")
        } catch { case e: Throwable =>
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
