package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.BloomExprs

/** Behavior tests for the second-wave pipeline operators (PipelineOps):
  * Bloom prefilter correctness + selectivity, streak detection, resample
  * gap-fill/forward-fill, packing invariants, entropy edge cases, and
  * layout-independence of the stratified sample. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom prefilter passes all true matches and most non-matches are cut") {
    BloomExprs.register(spark)
    spark.range(0, 100).selectExpr("id AS k").createOrReplaceTempView("bl_keys")
    spark.range(0, 10000).selectExpr("id AS k").createOrReplaceTempView("bl_probe")
    val pre = spark.sql(
      """SELECT k FROM bl_probe
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(k), 100L, 1600L) FROM bl_keys),
        |  xxhash64(k))""".stripMargin)
    val preKeys = pre.as[Long].collect().toSet
    // no false negatives — every true key survives the prefilter
    assert((0L until 100L).forall(preKeys.contains))
    // the prefilter is selective: far fewer than the 10k probe rows pass
    assert(preKeys.size < 2000)
    // exact verify on top of the prefilter gives exactly the true set
    val exact = pre.join(spark.table("bl_keys"), "k").as[Long].collect().toSet
    assert(exact === (0L until 100L).toSet)
  }

  test("streak grouping finds runs of consecutive equal values") {
    val ev = Seq(
      // user 1: A A A B A A  -> streaks A:3, B:1, A:2
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"),
      (1L, 4L, "B"), (1L, 5L, "A"), (1L, 6L, "A"),
      // user 2: B B -> streak B:2
      (2L, 1L, "B"), (2L, 2L, "B")
    ).toDF("user_id", "seq", "event_type")
    val byU = Window.partitionBy("user_id").orderBy("seq")
    val byUT = Window.partitionBy("user_id", "event_type").orderBy("seq")
    val runs = ev
      .select(col("user_id"), col("event_type"),
        row_number().over(byU).as("rn"), row_number().over(byUT).as("rnt"))
      .groupBy(col("user_id"), col("event_type"), (col("rn") - col("rnt")).as("g"))
      .agg(count(lit(1)).as("len"))
      .select("user_id", "event_type", "len")
      .as[(Long, String, Long)].collect().toSeq
      .groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).sorted).toMap
    assert(runs((1L, "A")) === Seq(2L, 3L))
    assert(runs((1L, "B")) === Seq(1L))
    assert(runs((2L, "B")) === Seq(2L))
  }

  test("resample fills gap hours with zero counts and carries value forward") {
    val ts = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, ts(0, 10), 2.0), (1L, ts(0, 40), 3.0), // hour 0: 2 events, 500 cents
      (1L, ts(3, 15), 7.0) //                        hour 3: 1 event, 700 cents
    ).toDF("user_id", "ts", "value")
    val hourly = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("bigint")).as("sv"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("hr"), coalesce(col("n"), lit(0L)).as("n"),
        last("sv", ignoreNulls = true).over(w).as("filled"))
      .orderBy("hr")
      .as[(Timestamp, Long, Long)].collect().toSeq
    // hours 0..3 all present; 1 and 2 are gap-filled with the hour-0 value
    assert(out.map(_._2) === Seq(2L, 0L, 0L, 1L))
    assert(out.map(_._3) === Seq(500L, 500L, 500L, 700L))
  }

  test("packing bins are contiguous and all tokens are conserved") {
    val out = operators.PipelineOps.qDocPack.fn(spark, sf())
      .as[(String, Int, Long, Long)].collect().toSeq
    val total = out.map(_._4).sum
    val direct = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(total === direct) // every token lands in exactly one bin
    out.groupBy(_._1).foreach { case (_, rows) =>
      val bins = rows.map(_._2).sorted
      assert(bins === (0 to bins.max).toSeq) // no skipped bin indexes
      // every bin but the last starts below the cap boundary it fills
      rows.filter(_._2 < bins.max).foreach { case (_, _, _, tok) =>
        assert(tok >= 1L) // non-degenerate
      }
    }
  }

  test("token entropy: uniform doc hits ln(k), constant doc hits 0") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a")).toDF("doc_id", "text")
    val h = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), sum(col("c") * log(col("c"))).as("s"))
      .select(col("doc_id"), (log(col("n")) - col("s") / col("n")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(h(1L) - math.log(4)) < 1e-12)
    assert(math.abs(h(2L)) < 1e-12)
  }

  test("stratified sample is identical under repartitioning") {
    val base = operators.PipelineOps.qSampleStratified.fn(spark, sf()).collect().toSeq
    val doc = spark.read.parquet(s"${sf()}/documents.parquet").repartition(13)
    doc.createOrReplaceTempView("documents_reparted")
    // same per-row filter on a different layout must select the same rows
    val again = operators.PipelineOps.qSampleStratified.fn(spark, sf()).collect().toSeq
    assert(base === again)
    assert(base.nonEmpty)
  }
}
