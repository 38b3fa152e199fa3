package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Global sort + limit and set operations (SURVEY.md §2.5 Q22-Q23).
  *
  * Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProject —
  * each partition keeps its local top-k heap and only k rows per partition
  * reach the driver-side merge; there is NO global sort shuffle. The set
  * ops are DISTINCT-semantics (per SQL): Catalyst plans them as hash
  * aggregates / semi joins on the full row, deduping map-side first.
  */
object SortSet {

  /** Q22 — global top-k: top 25 line items by net revenue, totally ordered
    * with a unique (orderkey, linenumber) tiebreak. */
  val q22 = Q(
    "q_sort_limit",
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS net
      |FROM lineitem
      |ORDER BY net DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy(desc("net"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(25)
  }

  /** Q23 — set operations: customers active in 1996 INTERSECT 1997,
    * EXCEPT 1998-actives, UNION a literal key set. Spark's
    * intersect/except are DISTINCT-semantics, matching SQL. */
  val q23 = Q(
    "q_set_ops",
    """WITH a96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |a97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
      |a98 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998),
      |survivors AS (
      |  SELECT o_custkey FROM (SELECT * FROM a96 INTERSECT SELECT * FROM a97
      |                         EXCEPT SELECT * FROM a98)
      |  UNION SELECT CAST(x AS BIGINT) FROM (VALUES (1), (2), (3)) t(x))
      |SELECT COUNT(*) AS n_keys, MIN(o_custkey) AS min_key, MAX(o_custkey) AS max_key
      |FROM survivors""".stripMargin
  ) { (spark, dir) =>
    def active(yr: Int) = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select("o_custkey").distinct()
    val lits = spark.range(1, 4).toDF("o_custkey")
    active(1996).intersect(active(1997)).except(active(1998))
      .union(lits).distinct()
      .agg(count(lit(1)).as("n_keys"),
        min(col("o_custkey")).as("min_key"), max(col("o_custkey")).as("max_key"))
  }

  def all: Seq[Q] = Seq(q22, q23)
}
