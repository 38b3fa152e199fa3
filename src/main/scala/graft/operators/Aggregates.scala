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

  /** Q14 — distinct aggregation: Catalyst plans count(DISTINCT) as an
    * Expand + two-phase aggregate; the distinct keys are deduped map-side
    * so the shuffle carries (status, custkey) pairs, not rows. */
  val q14 = Q(
    "q_agg_distinct",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_custs
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), countDistinct("o_custkey").as("n_custs"))
      .orderBy("o_orderstatus")
  }

  /** Q15 — rollup / grouping sets over the star join. Output has NO nulls:
    * rollup-nulls are coalesced to a label and the grouping_id column
    * disambiguates, so the cross-engine NULL-ordering trap (Spark NULLS
    * FIRST vs DuckDB NULLS LAST) never arises. grouping_id bit order:
    * first rollup column = MSB on both engines. */
  val q15 = Q(
    "q_agg_rollup",
    s"""SELECT COALESCE(r_name, '(all)') AS r,
       |  COALESCE(n_name, '(all)') AS n,
       |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
       |  ${sqlExactSum("o_totalprice", 100)} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY gid, r, n""".stripMargin
  ) { (spark, dir) =>
    // The rollup runs through spark.sql: selecting the rollup's grouping
    // attributes back out of a DataFrame-API rollup().agg() trips Spark 4's
    // ambiguous-column check (the Expand keeps original + null-extended
    // attribute copies); SQL analysis resolves GROUP BY ROLLUP natively.
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "o_totalprice")
      .createOrReplaceTempView("q15_star")
    spark.sql(
      // same exact-units sum as Det.exactSum, spelled in Spark SQL with the
      // DECIMAL(38,0) accumulator (Spark's SUM(BIGINT) would wrap at scale)
      s"""SELECT COALESCE(r_name, '(all)') AS r,
         |  COALESCE(n_name, '(all)') AS n,
         |  grouping_id() AS gid,
         |  CAST(SUM(CAST(${sqlUnits("o_totalprice", 100)} AS DECIMAL(38,0))) / 100.0 AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_orders
         |FROM q15_star
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY gid, r, n""".stripMargin)
  }

  /** Q16 — statistical aggregates: stddev/variance/exact median/corr.
    * Results are rounded to 6 dp — both engines compute these with
    * numerically different but ~1e-13-relative-close algorithms. */
  val q16 = Q(
    "q_agg_stats",
    """SELECT c_mktsegment,
      |  round(stddev_samp(c_acctbal), 6) AS sd_bal,
      |  round(var_samp(c_acctbal), 6) AS var_bal,
      |  round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5), 6) AS med_bal,
      |  min(c_acctbal) AS min_bal,
      |  max(c_acctbal) AS max_bal,
      |  round(corr(c_acctbal, CAST(c_nationkey AS DOUBLE)), 6) AS corr_bal_nat
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(
        round(stddev_samp(col("c_acctbal")), 6).as("sd_bal"),
        round(var_samp(col("c_acctbal")), 6).as("var_bal"),
        round(expr("percentile(c_acctbal, 0.5)"), 6).as("med_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        round(corr(col("c_acctbal"), col("c_nationkey").cast("double")), 6)
          .as("corr_bal_nat"))
      .orderBy("c_mktsegment")
  }

  /** Q17 — approximate distinct (HLL sketch). No oracle: estimates differ
    * across engines by design; ApproxSpec asserts ±5% of exact instead.
    * At 100 TB this is THE distinct-count: the sketch merges associatively
    * so the shuffle carries one ~few-KB sketch per group per partition. */
  val q17 = Q.noOracle("q_agg_approx") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Approximate quantiles (KLL-style sketch via percentile_approx). No
    * oracle for the same reason as Q17 — sketch estimates differ across
    * engines by design; VectorAndApproxSpec asserts each estimate lands
    * within the accuracy bound of the exact percentile. At 100 TB this is
    * THE percentile: the sketch merges associatively, so the shuffle
    * carries one bounded-size sketch per group instead of sorting the
    * column. */
  val qAggApproxQuantile = Q.noOracle("q_agg_approx_quantile") { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-day
    * customer sketches rolled up to months by sketch UNION — the raw
    * keys are never rescanned. This is the property approx_count_distinct
    * (Q17) does not expose: its partial state dies inside one query,
    * while an hll_sketch column PERSISTS (a ~KB binary per shard) and
    * re-aggregates to any coarser grain — day→month→quarter, per-shard→
    * global — which is how a 100 TB warehouse serves distinct-count
    * dashboards without touching the fact table twice. Union is
    * associative and commutative, so map-side partials and AQE re-plans
    * keep working, and the merged estimate is BIT-DETERMINISTIC: the
    * union of daily sketches equals the whole-month sketch exactly
    * (VectorAndApproxSpec), not merely approximately. No oracle —
    * DuckDB's HLL is a different implementation by design; the spec
    * asserts merge-equals-whole equality and the ±5% accuracy contract
    * vs exact. */
  val qAggSketchMerge = Q.noOracle("q_agg_sketch_merge") { (spark, dir) =>
    val daily = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        to_date(col("o_orderdate")).as("day"), col("o_custkey"))
      .groupBy("month", "day")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    daily.groupBy("month")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_cust"),
        count(lit(1)).cast("int").as("n_days"))
      .orderBy("month")
  }

  /** Q18 — custom typed UDAF (geometric mean, functions.GeoMean). */
  val q18 = Q(
    "q_udaf_geomean",
    """SELECT l_returnflag,
      |  round(exp(avg(ln(l_extendedprice))), 6) AS geomean_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_extendedprice > 0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
  ) { (spark, dir) =>
    val geo = udaf(graft.functions.GeoMean)
    Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 0)
      .groupBy("l_returnflag")
      .agg(round(geo(col("l_extendedprice")), 6).as("geomean_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }


  /** Multiple DISTINCT aggregates in one pass — planned through Catalyst's
    * Expand (one replicated stream per distinct set) + two-phase
    * aggregation, the shape that matters because each extra distinct
    * multiplies the shuffled rows: worth one graded query so a planner
    * regression (e.g. falling back to per-distinct subplans) is visible.
    * Distinct years ride on an exact integer year. */
  val qAggMultiDistinct = Q(
    "q_agg_multi_distinct",
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT year(o_orderdate)) AS n_years,
      |  COUNT(DISTINCT o_orderpriority) AS n_prios,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** Set-valued aggregate: the distinct priorities per status, surfaced as
    * a sorted comma-joined STRING (collect_set is unordered by contract —
    * array_sort + array_join make it deterministic AND scalar; the driver's
    * pandas-based hash comparator cannot sort array-typed cells), plus the
    * set cardinality. */
  val qAggCollectSet = Q(
    "q_agg_collect_set",
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios,
      |  CAST(len(list(DISTINCT o_orderpriority)) AS INT) AS n_prios
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("prios"),
        size(collect_set(col("o_orderpriority"))).as("n_prios"))
      .orderBy("o_orderstatus")
  }

  /** Per-group simple linear regression (price vs quantity) from EXACT
    * integer moments: n, Σx, Σy, Σxy, Σx² accumulate as DECIMAL(38,0)
    * over cent units (per-row products ≤ 5e10, fit a long; group moments
    * at 1e11 rows reach ~1e26 — inside 38 digits, where a BIGINT
    * accumulator would have wrapped). slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    * and intercept = (ΣyΣx²−ΣxΣxy)/(nΣx²−(Σx)²) are each ONE double
    * division of two exact integers — identical cross-engine, unlike
    * float regr_slope/regr_intercept whose accumulation order leaks.
    * One scan, one aggregate pass for both coefficients. */
  val qAggRegression = Q(
    "q_agg_regression",
    """WITH m AS (SELECT l_returnflag,
      |    COUNT(*) AS n,
      |    SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
      |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
      |    SUM(CAST(round(l_quantity * 100) AS BIGINT)
      |        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
      |    SUM(CAST(round(l_quantity * 100) AS BIGINT)
      |        * CAST(round(l_quantity * 100) AS BIGINT)) AS sx2
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS slope,
      |  round(CAST(sy * sx2 - sx * sxy AS DOUBLE)
      |    / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS intercept
      |FROM m WHERE n * sx2 - sx * sx <> 0
      |ORDER BY l_returnflag""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Det
    val dec = "decimal(38,0)"
    val x = Det.units(col("l_quantity"), 100)
    val y = Det.units(col("l_extendedprice"), 100)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sx2"))
      // a group with constant x (zero variance — e.g. a single row) has no
      // defined regression line: excluded on BOTH engines, never a /0.
      .filter(col("n") * col("sx2") - col("sx") * col("sx") =!= 0)
      .select(col("l_returnflag"), col("n").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"),
        round((col("sy") * col("sx2") - col("sx") * col("sxy")).cast("double")
          / (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"), 6)
          .as("intercept"))
      .orderBy("l_returnflag")
  }

  /** INCREMENTAL aggregate maintenance — the materialized-view refresh a
    * 100 TB warehouse runs instead of recomputing: a per-supplier
    * (count, exact-unit sum) aggregate table is first built from the
    * already-ingested facts, then a new batch arrives and the aggregate
    * is refreshed by merging the table with the BATCH's partial
    * aggregate — `new = (old ∪ partial(batch)).groupBy(key).sum` — so
    * the refresh rescans |keys| + |batch| rows, never the base fact
    * table. Distributive counters (count, unit-sum) merge exactly;
    * the algebraic avg derives from them at read time. The oracle
    * aggregates ALL facts from scratch, so a green hash proves the
    * incremental refresh equals the full recompute. */
  val qAggIncremental = Q(
    "q_agg_incremental",
    s"""SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
       |  ${sqlExactSum("l_quantity", 100)} AS sum_qty,
       |  ${sqlExactAvg("l_quantity", 100)} AS avg_qty
       |FROM lineitem
       |GROUP BY 1 ORDER BY l_suppkey""".stripMargin
  ) { (spark, dir) =>
    def partialAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_suppkey")
        .agg(count(lit(1)).cast("bigint").as("n_items"),
          sum(units(col("l_quantity"), 100).cast("decimal(38,0)")).as("squ"))
    val facts = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val aggTable = Scans.rtTable("agg_mv")
    // day 0: build the aggregate table from the already-ingested facts
    graft.sources.Sinks.writeClustered(
      partialAgg(facts.filter(col("l_orderkey") % 3 =!= 0)),
      4, Seq("l_suppkey"), aggTable)
    // refresh: merge the |keys|-row aggregate table with the new batch's
    // partial aggregate — the base facts are NOT rescanned
    val refreshed = spark.table(aggTable)
      .unionByName(partialAgg(facts.filter(col("l_orderkey") % 3 === 0)))
      .groupBy("l_suppkey")
      .agg(sum("n_items").cast("bigint").as("n_items"),
        sum("squ").as("squ"))
    graft.sources.Sinks.writeClustered(refreshed, 4, Seq("l_suppkey"),
      s"${aggTable}_v1")
    spark.table(s"${aggTable}_v1")
      .select(col("l_suppkey"), col("n_items"),
        (col("squ") / lit(100.0)).as("sum_qty"),
        (col("squ") / lit(100.0) / col("n_items")).as("avg_qty"))
      .orderBy("l_suppkey")
  }

  def all: Seq[Q] = Seq(q13, q14, q15, q16, q17, qAggApproxQuantile,
    qAggSketchMerge, q18, qAggMultiDistinct, qAggCollectSet, qAggRegression,
    qAggIncremental)
}
