package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Filter / predicate / dedup operators (SURVEY.md §2.2).
  *
  * Scale notes: every predicate here is pushable — `=`, `<`, BETWEEN, IN,
  * LIKE and IS NOT NULL all reach the parquet reader as PushedFilters, so
  * at 100 TB row-groups that can't match are skipped on min/max stats
  * before any row is materialized. `dropDuplicates` on a projected column
  * pair is a hash aggregate: partial dedup map-side, shuffle only the
  * surviving distinct pairs (bounded by key cardinality, not input size).
  */
object Filters {

  /** Q03 — compound predicates: LIKE, BETWEEN, IN, IS NOT NULL, AND/OR/NOT. */
  val q03 = Q(
    "q_filter_pred",
    """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
      |FROM part
      |WHERE (p_name LIKE '%bolt%' OR p_type LIKE 'PROMO%')
      |  AND p_size BETWEEN 5 AND 40
      |  AND p_brand IN ('Brand#1','Brand#3','Brand#5','Brand#7','Brand#11',
      |                  'Brand#13','Brand#17','Brand#19','Brand#23')
      |  AND p_retailprice IS NOT NULL
      |  AND NOT (p_size = 13)
      |ORDER BY p_partkey""".stripMargin
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .filter(
        (col("p_name").like("%bolt%") || col("p_type").like("PROMO%")) &&
        col("p_size").between(5, 40) &&
        col("p_brand").isin("Brand#1", "Brand#3", "Brand#5", "Brand#7",
          "Brand#11", "Brand#13", "Brand#17", "Brand#19", "Brand#23") &&
        col("p_retailprice").isNotNull &&
        !(col("p_size") === 13))
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** Q04 — exact row dedup: project to the dedup key pair FIRST so the
    * surviving row is fully determined (dropDuplicates keeps an arbitrary
    * row among duplicates for non-key columns — never rely on those). */
  val q04 = Q(
    "q_dedup_exact_rows",
    """SELECT o_orderstatus, COUNT(*) AS n_pairs
      |FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderstatus")
      .dropDuplicates()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("o_orderstatus")
  }

  def all: Seq[Q] = Seq(q03, q04)
}
