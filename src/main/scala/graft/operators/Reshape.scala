package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.Det
import graft.sources.Tables

/** Reshaping operators: CUBE grouping sets, pivot (long→wide), and
  * unpivot/melt (wide→long).
  *
  * Scale notes: CUBE is an Expand (4 grouping-set copies here) feeding one
  * partial→final hash aggregate — output is group-count sized. Pivot with
  * an EXPLICIT value list compiles to one pass of conditional aggregates
  * (never the two-job distinct-scan Spark runs when values are omitted —
  * always pass the list at 100 TB). Unpivot is a per-row Expand, linear.
  */
object Reshape {

  /** CUBE over the star join: all four grouping sets, null-label coalesced
    * (same determinism discipline as Q15's ROLLUP — no NULL ordering trap,
    * grouping_id disambiguates). */
  val qAggCube = Q(
    "q_agg_cube",
    s"""SELECT COALESCE(r_name, '(all)') AS r,
       |  COALESCE(n_name, '(all)') AS n,
       |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
       |  ${Det.sqlExactSum("o_totalprice", 100)} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY CUBE(r_name, n_name)
       |ORDER BY gid, r, n""".stripMargin
  ) { (spark, dir) =>
    // SQL path for the same reason as Q15: re-selecting grouping columns
    // out of a DataFrame-API cube().agg() trips Spark 4's ambiguous-column
    // check (Expand keeps original + null-extended attribute copies)
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")
      .createOrReplaceTempView("qcube_star")
    spark.sql(
      s"""SELECT COALESCE(r_name, '(all)') AS r,
         |  COALESCE(n_name, '(all)') AS n,
         |  grouping_id() AS gid,
         |  CAST(SUM(CAST(${Det.sqlUnits("o_totalprice", 100)} AS DECIMAL(38,0))) / 100.0 AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_orders
         |FROM qcube_star
         |GROUP BY CUBE(r_name, n_name)
         |ORDER BY gid, r, n""".stripMargin)
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize:
    * exactly the (r_name) and (n_name) marginals, no grand total, no
    * pairwise set. One Expand + one partial→final aggregate. */
  val qAggGroupingSets = Q(
    "q_agg_grouping_sets",
    s"""SELECT COALESCE(r_name, '(all)') AS r,
       |  COALESCE(n_name, '(all)') AS n,
       |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
       |  ${Det.sqlExactSum("o_totalprice", 100)} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY GROUPING SETS ((r_name), (n_name))
       |ORDER BY gid, r, n""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")
      .createOrReplaceTempView("qgsets_star")
    spark.sql(
      s"""SELECT COALESCE(r_name, '(all)') AS r,
         |  COALESCE(n_name, '(all)') AS n,
         |  grouping_id() AS gid,
         |  CAST(SUM(CAST(${Det.sqlUnits("o_totalprice", 100)} AS DECIMAL(38,0))) / 100.0 AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_orders
         |FROM qgsets_star
         |GROUP BY GROUPING SETS ((r_name), (n_name))
         |ORDER BY gid, r, n""".stripMargin)
  }

  /** Pivot long→wide: per returnflag, quantity sums split by linestatus
    * columns. The value list is EXPLICIT (Seq("F","O")) so the plan is one
    * conditional-aggregate pass — omitting it makes Spark run a distinct
    * scan first, an extra full-data job at 100 TB. */
  val qPivot = Q(
    "q_pivot",
    s"""SELECT l_returnflag,
       |  SUM(${Det.sqlUnits("l_quantity", 100)}) FILTER (WHERE l_linestatus = 'F') / 100.0 AS f_qty,
       |  SUM(${Det.sqlUnits("l_quantity", 100)}) FILTER (WHERE l_linestatus = 'O') / 100.0 AS o_qty,
       |  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt,
       |  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(Det.exactSum(col("l_quantity"), 100).as("qty"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        col("F_qty").as("f_qty"), col("O_qty").as("o_qty"),
        col("F_cnt").as("f_cnt"), col("O_cnt").as("o_cnt"))
      .orderBy("l_returnflag")
  }

  /** Unpivot/melt wide→long: part attributes into (attr, val) rows — the
    * inverse reshape, a per-row Expand with no shuffle at all. */
  val qUnpivot = Q(
    "q_unpivot",
    """SELECT p_partkey, 'retail' AS attr, p_retailprice AS val
      |FROM part WHERE p_partkey <= 200
      |UNION ALL
      |SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
      |FROM part WHERE p_partkey <= 200
      |ORDER BY p_partkey, attr""".stripMargin
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        col("p_retailprice").as("retail"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retail"), col("size")),
        "attr", "val")
      .orderBy("p_partkey", "attr")
  }

  def all: Seq[Q] = Seq(qAggCube, qAggGroupingSets, qPivot, qUnpivot)
}
