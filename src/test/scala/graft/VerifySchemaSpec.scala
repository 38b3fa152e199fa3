package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Locks the round-19 fix for the r18 13-row regression: with
  * spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS (needed by the
  * footer-stats harvest), every TimestampType output column writes
  * isAdjustedToUTC=true and reads back tz-annotated — failing the driver's
  * tz-aware schema compare against DuckDB's naive TIMESTAMP. Verify now
  * normalizes every output TimestampType to TimestampNTZType before the
  * dump and trips a loud failure if an annotated column still reaches a
  * written footer. These tests pin BOTH halves so a future session-conf
  * change cannot silently re-break 13 rows. */
class VerifySchemaSpec extends SparkTestBase {

  private def tmp(name: String) = {
    val d = java.nio.file.Files.createTempDirectory(s"vschema_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def sampleTs = {
    val s = spark
    import s.implicits._
    Seq(("a", "2024-01-02 03:04:05.123456"), ("b", "2024-06-07 08:09:10.5"))
      .toDF("k", "raw")
      .select($"k", to_timestamp($"raw").as("ts"))
  }

  test("un-normalized TimestampType writes isAdjustedToUTC=true under TIMESTAMP_MICROS (the r18 regression shape) and the tripwire sees it") {
    assert(sampleTs.schema("ts").dataType == TimestampType)
    val dir = tmp("raw")
    sampleTs.coalesce(1).write.mode("overwrite").parquet(dir)
    val bad = Verify.utcAnnotated(spark, dir)
    assert(bad == Seq("ts"), s"tripwire should flag the annotated column, got $bad")
  }

  test("ntzNormalize rewrites TimestampType to NTZ recursively and the written footer carries no tz annotation") {
    val nested = sampleTs
      .withColumn("arr", array(col("ts"), col("ts")))
      .withColumn("st", struct(col("ts").as("inner"), lit(1).as("n")))
    val norm = Verify.ntzNormalize(nested)
    def noTz(dt: DataType): Boolean = dt match {
      case TimestampType      => false
      case ArrayType(e, _)    => noTz(e)
      case MapType(k, v, _)   => noTz(k) && noTz(v)
      case StructType(fields) => fields.forall(f => noTz(f.dataType))
      case _                  => true
    }
    assert(norm.schema.fields.forall(f => noTz(f.dataType)),
      s"normalized schema still holds TimestampType: ${norm.schema.treeString}")
    val dir = tmp("norm")
    norm.coalesce(1).write.mode("overwrite").parquet(dir)
    assert(Verify.utcAnnotated(spark, dir).isEmpty)
  }

  test("ntzNormalize is value-preserving under the pinned UTC session TZ (written micros identical)") {
    val dir1 = tmp("v1"); val dir2 = tmp("v2")
    sampleTs.coalesce(1).write.mode("overwrite").parquet(dir1)
    Verify.ntzNormalize(sampleTs).coalesce(1).write.mode("overwrite").parquet(dir2)
    // Compare the raw INT64 micros both files carry: the annotation flips,
    // the stored instants must not.
    def micros(dir: String): Seq[(String, Long)] = {
      val df = spark.read.parquet(dir)
      val tsCol = df.schema.fields.find(f =>
        f.dataType == TimestampType || f.dataType == TimestampNTZType).get.name
      // unix_micros needs TimestampType; NTZ→Timestamp is value-preserving
      // under the UTC session TZ (cast-to-long would truncate to seconds)
      df.select(col("k"), unix_micros(col(tsCol).cast(TimestampType)))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    }
    assert(micros(dir1) == micros(dir2))
  }
}
