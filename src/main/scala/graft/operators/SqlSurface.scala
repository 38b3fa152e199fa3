package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-STRING entry point: the fixtures registered as temp views and
  * graded queries executed through `spark.sql(text)` — the first API a
  * user coming from any SQL warehouse tries. Everything else in the repo
  * drives the DataFrame builder; these queries prove the text path (ANSI
  * parser → the same Catalyst plans) over the same loader layer, so
  * `events`' nanos handling and warm-cache behavior are identical in both
  * APIs.
  *
  * Dialect note: the graded statements are written in the portable
  * SQL-92-plus-windows intersection both engines parse, except for typed
  * division — Spark parses `100.0` as DECIMAL and DuckDB as DOUBLE, so
  * exact-unit sums cast the divisor explicitly (`CAST(100 AS DOUBLE)`)
  * to keep the output schema DOUBLE on both engines.
  */
object SqlSurface {

  /** Register the ten fixture tables as session temp views over the
    * [[Tables]] loaders (NOT raw `spark.read.parquet`): the views inherit
    * the events ts normalization and serve warm cached frames when the
    * session warmed them. Idempotent per session.
    *
    * Fault-isolated per table: a table whose loader throws (fixture drift
    * — round 10's regenerated `events` took down ALL THREE q_sql_* queries
    * this way, none of which read events) is skipped, so only queries that
    * actually reference the broken view fail, with UNRESOLVED_RELATION
    * naming it. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      try Tables.table(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Throwable =>
        System.err.println(
          s"[sql-surface] view '$n' not registered (loader failed): " +
            Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }

  private def sqlQ(name: String, oracle: String, text: String): Q =
    Q(name, oracle) { (spark, dir) =>
      registerViews(spark, dir)
      spark.sql(text)
    }

  /** Flagship pricing summary through the TEXT path — the Spark SQL twin
    * of `q_agg_pricing` (same oracle), with Det's exact-integer-unit sum
    * discipline spelled out in SQL: units as BIGINT (exact binary, both
    * engines), accumulate as DECIMAL(38,0) (no wrap at 1e11-row groups),
    * one double division at the end. */
  val qSqlPricing: Q = sqlQ(
    "q_sql_pricing",
    // oracle: identical semantics in DuckDB dialect (SUM(BIGINT) widens
    // to HUGEINT natively, so no explicit decimal accumulator needed)
    s"""SELECT l_returnflag, l_linestatus,
       |  ${graft.functions.Det.sqlExactSum("l_quantity", 100)} AS sum_qty,
       |  ${graft.functions.Det.sqlExactSum("l_extendedprice", 100)} AS sum_base_price,
       |  ${graft.functions.Det.sqlExactSum("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_price,
       |  ${graft.functions.Det.sqlExactSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)} AS sum_charge,
       |  ${graft.functions.Det.sqlExactAvg("l_quantity", 100)} AS avg_qty,
       |  ${graft.functions.Det.sqlExactAvg("l_extendedprice", 100)} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // Spark SQL text (executed): DECIMAL(38,0) accumulator and DOUBLE
    // divisor made explicit — Spark's SUM(BIGINT) stays BIGINT (wraps),
    // and a bare `100.0` literal would parse as DECIMAL and change the
    // output type.
    """SELECT l_returnflag, l_linestatus,
      |  SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) / CAST(100 AS DOUBLE) AS sum_qty,
      |  SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) / CAST(100 AS DOUBLE) AS sum_base_price,
      |  SUM(CAST(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS DECIMAL(38,0))) / CAST(10000 AS DOUBLE) AS sum_disc_price,
      |  SUM(CAST(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT) AS DECIMAL(38,0))) / CAST(1000000 AS DOUBLE) AS sum_charge,
      |  SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) / CAST(100 AS DOUBLE) / COUNT(*) AS avg_qty,
      |  SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) / CAST(100 AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  /** Per-group top-k through the TEXT path: this statement sits in the
    * dialect intersection, so the SAME string is both the executed Spark
    * SQL and the DuckDB oracle — the strongest possible form of the
    * cross-engine contract. */
  private val topkSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  val qSqlTopk: Q = sqlQ("q_sql_topk", topkSql, topkSql)

  /** Multi-table star join through the TEXT path, also in the dialect
    * intersection (one string, both engines): nation-level revenue over
    * customer⋈orders⋈lineitem⋈nation. The exact-unit discipline survives
    * the intersection because BOTH engines return DECIMAL for
    * SUM(DECIMAL(38,0)) and DOUBLE for decimal/double division; the
    * parser path hands Catalyst the same join graph the builder API
    * would, so AQE still broadcasts the nation dim and shuffles the
    * facts on their keys. */
  private val joinSql =
    """SELECT n_name, COUNT(*) AS n_items,
      |  SUM(CAST(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
      |    AS DECIMAL(38,0))) / CAST(10000 AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON n_nationkey = c_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val qSqlJoin: Q = sqlQ("q_sql_join", joinSql, joinSql)

  def all: Seq[Q] = Seq(qSqlPricing, qSqlTopk, qSqlJoin)
}
