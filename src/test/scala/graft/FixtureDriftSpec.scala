package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 2026-08-12 fixture regeneration changed `events.ts`'s physical
  * encoding and 28 queries silently vanished from the round's correctness
  * (SURVEY §1.4). These tests pin the two defenses added in round 11:
  *
  *  1. the `events` loader adapts to every encoding the driver has shipped
  *     (INT64-nanos, timestamp[us]/NTZ) and normalizes to TimestampType;
  *  2. the schema tripwire turns any OTHER drift into a one-line
  *     "fixture drift" error naming the table/column, at first load.
  */
class FixtureDriftSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-drift-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("events loader normalizes the current fixture's ts to TimestampType") {
    val df = Tables.events(spark, sf())
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("events loader adapts to an NTZ (timestamp[us]) fixture") {
    val dir = tmp("ntz")
    spark.range(3).select(
        col("id").as("event_id"),
        expr("timestampadd(SECOND, id, TIMESTAMP_NTZ '2024-01-01 00:00:00')").as("ts"),
        col("id").as("user_id"),
        lit("click").as("event_type"),
        col("id").cast("double").as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    // UTC session: the NTZ wall-clock IS the UTC instant, bit-identical µs
    val us = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    assert(us === Seq(base, base + 1000000L, base + 2000000L))
  }

  test("events loader adapts to an epoch-nanos LongType fixture") {
    val dir = tmp("nanos")
    // nanosAsLong reads INT64 TIMESTAMP(NANOS) as LongType; a plain long
    // column round-trips through the same branch. 1µs-boundary + sub-µs
    // values prove the integer floor division.
    spark.createDataFrame(Seq(
        (1L, 1700000000000000000L, 7L, "click", 1.0, "{}"),
        (2L, 1700000000000001999L, 7L, "view", 2.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val us = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(us === Seq(1700000000000000L, 1700000000000001L))
  }

  test("an unknown ts encoding fails with a fixture-drift error naming the column") {
    val dir = tmp("bad-ts")
    spark.range(2).select(
        col("id").as("event_id"), lit("2024-01-01").as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        col("id").cast("double").as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("fixture drift"))
    assert(e.getMessage.contains("'ts'"))
  }

  test("tripwire: a dropped column fails loudly at load, naming it") {
    val dir = tmp("dropped")
    spark.range(2).select(
        col("id").as("doc_id"), lit("hello").as("text"),
        lit("en").as("lang"), lit("web").as("source")) // n_chars missing
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](
      Tables.documents(spark, dir).count())
    assert(e.getMessage.contains("fixture drift"))
    assert(e.getMessage.contains("'n_chars'"))
  }

  test("tripwire: a type-family change fails loudly; a width change does not") {
    val dir = tmp("retyped")
    // o_totalprice as STRING = family violation; o_custkey int32 (narrowed
    // from int64) must still load — benign width drift stays green.
    spark.range(2).select(
        col("id").as("o_orderkey"), col("id").cast("int").as("o_custkey"),
        lit("O").as("o_orderstatus"), lit("12.5").as("o_totalprice"),
        current_timestamp().as("o_orderdate"), lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val e = intercept[IllegalStateException](Tables.orders(spark, dir).count())
    assert(e.getMessage.contains("fixture drift"))
    assert(e.getMessage.contains("'o_totalprice'"))

    val dir2 = tmp("widened")
    spark.range(2).select(
        col("id").as("o_orderkey"), col("id").cast("int").as("o_custkey"),
        lit("O").as("o_orderstatus"), lit(12.5).as("o_totalprice"),
        current_timestamp().as("o_orderdate"), lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    assert(Tables.orders(spark, dir2).count() === 2)
  }
}
