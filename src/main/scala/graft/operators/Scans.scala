package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Scan / projection / source-shaped operators (SURVEY.md §2.1).
  *
  * Scale notes: both queries are narrow projections — Catalyst prunes the
  * parquet scan to exactly the referenced columns (check `ReadSchema` in
  * explain), so at 100 TB the scan reads 3-4 columns of the fact table, not
  * all 11. The JSON extraction is a per-row codegen'd expression; no UDF.
  */
object Scans {

  /** Q01 — parquet scan + projection + alias + computed column. Per-row
    * IEEE double arithmetic (`price * (1 - disc)`) is evaluation-order
    * deterministic, so no rounding is needed on the pass-through values. */
  val q01 = Q(
    "q_scan_project",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity AS qty, l_extendedprice AS price,
      |  l_extendedprice * (1 - l_discount) AS net
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q02 — JSON-in-string extraction: parse `events.props` ({"k": <int>}),
    * bucket by k % 10. `get_json_object` is a codegen'd path expression —
    * no parse-to-struct materialization, no UDF. */
  val q02 = Q(
    "q_json_props",
    """SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS bucket,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
      .orderBy("bucket")
  }

  /** Schema-evolution union: two ingest "generations" of the orders feed —
    * an old snapshot without the priority column (1996 and earlier) and a
    * new snapshot that added it — combined with unionByName(
    * allowMissingColumns = true), the lakehouse append-with-evolved-schema
    * path. Missing columns null-fill; the rollup then proves the null
    * semantics (old rows land in the '(none)' bucket). Both branches are
    * narrow projections of the same scan; the union is a zero-shuffle
    * concatenation. */
  val qSchemaEvolve = Q(
    "q_schema_evolve",
    """WITH legacy AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE year(o_orderdate) <= 1996),
      |modern AS (
      |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |  WHERE year(o_orderdate) > 1996),
      |unioned AS (
      |  SELECT * FROM legacy UNION ALL BY NAME SELECT * FROM modern)
      |SELECT coalesce(o_orderpriority, '(none)') AS priority,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
      |FROM unioned
      |GROUP BY priority
      |ORDER BY priority""".stripMargin
  ) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    val legacy = o.filter(year(col("o_orderdate")) <= 1996)
      .select("o_orderkey", "o_totalprice")
    val modern = o.filter(year(col("o_orderdate")) > 1996)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    legacy.unionByName(modern, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("(none)")).as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Det.exactSum(col("o_totalprice"), 100).as("revenue"))
      .orderBy("priority")
  }

  /** Partitioned-sink ROUND-TRIP, graded end-to-end: write orders
    * partitioned by priority ([[graft.sources.Sinks.writePartitioned]] —
    * repartition-first so files = partitions, not tasks × partitions),
    * read the directory tree BACK, and aggregate per partition value. The
    * oracle aggregates the source table directly, so any row lost,
    * duplicated, or corrupted by the write→read cycle (including the
    * partition-column directory encoding) breaks the cross-engine hash.
    * This is the §2 sink surface as a CORRECTNESS row, not just a
    * ScalaTest: SinkSourceSpec separately asserts partition pruning on
    * the read-back plan. Scale: one exchange on the partition column,
    * then a file-per-partition write — the same plan at any SF. */
  val qSinkRoundtrip = Q(
    "q_sink_roundtrip",
    """SELECT o_orderpriority AS prio, COUNT(*) AS n_rows,
      |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
      |FROM orders
      |GROUP BY prio
      |ORDER BY prio""".stripMargin
  ) { (spark, dir) =>
    val out = java.nio.file.Files
      .createTempDirectory("graft_sink_rt").toString + "/orders_by_prio"
    graft.sources.Sinks.writePartitioned(
      Tables.orders(spark, dir).select("o_orderpriority", "o_totalprice"),
      Seq("o_orderpriority"), out)
    spark.read.parquet(out)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Det.exactSum(col("o_totalprice"), 100).as("total_price"))
      .orderBy("prio")
  }

  def all: Seq[Q] = Seq(q01, q02, qSchemaEvolve, qSinkRoundtrip)
}
