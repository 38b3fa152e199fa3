package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.Det._
import graft.sources.Tables

/** Aggregation operators (SURVEY.md §2.4): hash aggregation with
  * partial/final phases, distinct aggregation, rollup/grouping sets,
  * statistical aggregates, approximate distinct, custom UDAF.
  *
  * Scale notes: all of these are groupBy aggregations over the largest
  * table; Catalyst plans them as partial (map-side) HashAggregate → shuffle
  * on the group keys → final HashAggregate, which is the right shape at
  * 100 TB (the shuffle carries one row per (partition × group), not per
  * input row). Group-key cardinality here is tiny (≤ dozens), so AQE
  * coalesces the post-shuffle partitions automatically.
  */
object Aggregates {

  /** Q13 — flagship pricing summary (TPC-H Q1 adapted to the fixture
    * columns). Exact-integer-unit sums: see Det. */
  val q13 = Q(
    "q_agg_pricing",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlExactSum("l_quantity", 100)} AS sum_qty,
       |  ${sqlExactSum("l_extendedprice", 100)} AS sum_base_price,
       |  ${sqlExactSum("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_price,
       |  ${sqlExactSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)} AS sum_charge,
       |  ${sqlExactAvg("l_quantity", 100)} AS avg_qty,
       |  ${sqlExactAvg("l_extendedprice", 100)} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        exactSum(col("l_quantity"), 100).as("sum_qty"),
        exactSum(col("l_extendedprice"), 100).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 1000000).as("sum_charge"),
        exactAvg(col("l_quantity"), 100).as("avg_qty"),
        exactAvg(col("l_extendedprice"), 100).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def all: Seq[Q] = Seq(q13)
}
