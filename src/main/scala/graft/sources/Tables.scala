package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md). Schemas are carried by the parquet files themselves; the
  * only table needing special handling is `events` (SURVEY.md §1.4).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * layer is the single seam where that swap happens — query code only ever
  * sees a DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark 4.x refuses
    * to read by default (PARQUET_TYPE_ILLEGAL). We read it as epoch-nanos
    * LongType via `nanosAsLong` and floor-truncate to microseconds with
    * *integer* division (`div`) — a double division would lose low bits of
    * the ~1.7e18 nanos value and can shift the result by 1µs at exact-µs
    * boundaries. DuckDB reads the same file natively, also truncating ns→µs,
    * so both engines see identical values (SURVEY.md §1.4, verified).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
