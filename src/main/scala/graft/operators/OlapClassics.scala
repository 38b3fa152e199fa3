package graft.operators

import graft.Q
import graft.functions.Det
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Classic warehouse report shapes not yet covered by the core operators:
  * distribution-of-group-sizes, HAVING-as-semijoin, disjunctive predicate
  * pushdown, conditional-share ratios, argmax-over-aggregate, and an
  * anti-join against a global threshold. (The fixture schema lacks
  * partsupp / shipmode / commitdate, so the classic TPC-H formulations are
  * ADAPTED to the columns that exist — see FIXTURES.md — never copied.)
  *
  * All revenue math follows the Det discipline: exact integer cents
  * through every shuffle, one double division at the end, so results are
  * partitioning-independent and hash-comparable cross-engine.
  */
object OlapClassics {

  /** Orders-per-customer distribution (TPC-H Q13 shape): LEFT join so
    * zero-order customers land in bucket 0, then a second aggregation
    * over the group sizes. Scale: the first aggregate is keyed by the
    * join key itself (custkey), so AQE plans join + count in one
    * exchange; the second aggregate's domain is order-count buckets —
    * tiny, map-side combinable. */
  val qOlapCustDist = Q(
    "q_olap_cust_dist",
    """WITH co AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT CAST(c_count AS BIGINT) AS c_count,
      |  CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Large-volume orders (TPC-H Q18 shape): the HAVING aggregate acts as
    * a semi-join filter on the fact table, then enriches survivors with
    * customer attributes. Scale: the heavy aggregate runs FIRST and
    * reduces 600k line items to the few thousand qualifying orders; the
    * enrichment joins move only survivors. Quantities round-to-nearest
    * before the BIGINT cast on BOTH engines — without the round, Spark's
    * double→long cast truncates while DuckDB's rounds, so a fractional
    * quantity would move per-order sums and the >185 HAVING boundary
    * differently per engine; with it the threshold is exact either way. */
  val qOlapBigOrders = Q(
    "q_olap_big_orders",
    """WITH big AS (
      |  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 185)
      |SELECT c_name, o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
      |  o_totalprice, sum_qty
      |FROM big JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 185)
    big
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** Disjunctive multi-column predicates (TPC-H Q19 shape): revenue from
    * three OR'd brand/size/quantity bands. The point at scale is predicate
    * placement: the l_quantity bounds (OR over all branches: [1, 30])
    * and p_size bounds ([1, 15]) are implied per-table ranges — Catalyst
    * cannot derive them from the cross-table OR, so the implementation
    * states the implied single-table envelopes explicitly and they reach
    * the parquet scans as PushedFilters; the exact OR evaluates post-join
    * on the pre-filtered rows. The oracle needs no such hints (single
    * process), and the envelopes don't change the result. */
  val qOlapDisjunct = Q(
    "q_olap_disjunct",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |    AS BIGINT) AS rev_units
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
  ) { (spark, dir) =>
    // Implied single-table envelopes, stated so they push to the scans:
    // lineitem reads only qty ∈ [1,30] rows, part only size ∈ [1,15] of
    // the three brands — the join then sees a fraction of either table.
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(1, 30))
    val pt = Tables.part(spark, dir)
      .filter(col("p_size").between(1, 15) &&
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#24"))
    val branch =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(pt, col("p_partkey") === col("l_partkey"))
      .filter(branch)
      .agg(count(lit(1)).as("n_rows"),
        sum(Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .cast("decimal(38,0)")).cast("long").as("rev_units"))
  }

  /** Per-year national market share inside one region (TPC-H Q8 shape):
    * a conditional-sum ratio over a star join. Scale: dims broadcast,
    * the fact scans once, and the share is numerator/denominator of two
    * exact integer sums in ONE aggregate pass — never two scans. */
  val qOlapMktShare = Q(
    "q_olap_mkt_share",
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS units
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |SELECT o_year,
      |  CAST(SUM(CASE WHEN n_name = 'NATION_7' THEN units ELSE 0 END) AS BIGINT)
      |    AS nation_units,
      |  CAST(SUM(units) AS BIGINT) AS total_units,
      |  round(CAST(SUM(CASE WHEN n_name = 'NATION_7' THEN units ELSE 0 END) AS DOUBLE)
      |    / SUM(units), 6) AS share
      |FROM rev GROUP BY o_year
      |HAVING SUM(units) <> 0
      |ORDER BY o_year""".stripMargin
  ) { (spark, dir) =>
    val units = Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), units.as("units"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(year(col("o_orderdate")).cast("int").as("o_year"),
        col("n_name"), col("units"))
    val natUnits = sum(when(col("n_name") === "NATION_7", col("units"))
      .otherwise(0L).cast("decimal(38,0)"))
    rev.groupBy("o_year")
      .agg(natUnits.cast("long").as("nation_units"),
        sum(col("units").cast("decimal(38,0)")).as("total_dec"),
        natUnits.as("nation_dec"))
      // a year whose revenue units sum to exactly zero has no defined
      // share: excluded on BOTH engines rather than dividing by zero.
      .filter(col("total_dec") =!= 0)
      .select(col("o_year"), col("nation_units"),
        col("total_dec").cast("long").as("total_units"),
        round(col("nation_dec").cast("double") / col("total_dec"), 6).as("share"))
      .orderBy("o_year")
  }

  /** Top supplier by quarterly revenue (TPC-H Q15 shape):
    * argmax-over-aggregate via a one-row max frame joined back — never a
    * global sort. Scale: the aggregate reduces the fact table to one row
    * per supplier first; the max is a one-row frame (AQE broadcasts it),
    * and ties surface as multiple rows (deterministic, ordered). */
  val qOlapTopSupplier = Q(
    "q_olap_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |      AS BIGINT) AS rev_units
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, rev_units
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE rev_units = (SELECT MAX(rev_units) FROM rev)
      |ORDER BY s_suppkey""".stripMargin
  ) { (spark, dir) =>
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
        .cast("decimal(38,0)")).cast("long").as("rev_units"))
    val mx = rev.agg(max("rev_units").as("mx"))
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(mx) // one-row frame
      .filter(col("rev_units") === col("mx"))
      .select("s_suppkey", "s_name", "rev_units")
      .orderBy("s_suppkey")
  }

  /** Lapsed high-balance customers per nation (TPC-H Q22 shape): an
    * anti-join against recent orders, gated on a global mean threshold.
    * The mean comparison is EXACT — `cents·n > Σcents` over positive
    * balances — so the boundary cannot flip on a last-ulp AVG difference
    * between engines. Scale: the threshold is a one-row aggregate; the
    * anti-join's right side is pre-filtered to recent orders only. */
  val qOlapLapsedRich = Q(
    "q_olap_lapsed_rich",
    """WITH st AS (
      |  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
      |    COUNT(*) AS n
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
      |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM customer JOIN nation ON c_nationkey = n_nationkey, st
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * st.n > st.s
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY n_name
      |ORDER BY nation""".stripMargin
  ) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        Det.units(col("c_acctbal"), 100).as("cents"))
    val st = cust.filter(col("cents") > 0)
      .agg(sum(col("cents").cast("decimal(38,0)")).cast("long").as("s"),
        count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(st) // one-row threshold frame
      .filter(col("cents") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("cents").cast("decimal(38,0)")).cast("long").as("bal_cents"))
      .orderBy("nation")
  }

  /** Two-nation trade volume (TPC-H Q7 shape): revenue flowing between a
    * customer nation and a supplier nation, both directions, per ship
    * year. Scale: both nation filters resolve on broadcast dims BEFORE
    * the fact join, so the lineitem scan output is pre-pruned to the two
    * trading pairs; one aggregate pass, exact cents. */
  val qOlapVolumeShip = Q(
    "q_olap_volume_ship",
    """SELECT supp_nation, cust_nation, o_year,
      |  CAST(SUM(units) AS BIGINT) AS rev_units
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS o_year,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS units
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      |     OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      |GROUP BY supp_nation, cust_nation, o_year
      |ORDER BY supp_nation, cust_nation, o_year""".stripMargin
  ) { (spark, dir) =>
    // Implied single-side envelope (same technique as q_olap_disjunct):
    // the cross-side OR can't push below either nation join, but each
    // side independently must be one of the two trading nations — stating
    // that prunes supplier/customer rows AT the broadcast joins, so the
    // fact rows of the other 23 nations never survive to the filter.
    val trading = Seq("NATION_3", "NATION_8")
    val n1 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(trading: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin(trading: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("units"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("o_year"))
      .agg(sum(col("units").cast("decimal(38,0)")).cast("long").as("rev_units"))
      .select("supp_nation", "cust_nation", "o_year", "rev_units")
      .orderBy("supp_nation", "cust_nation", "o_year")
  }

  /** Returned-item revenue ranking (TPC-H Q10 shape): top 10 customers by
    * revenue lost to returns in one quarter. Scale: date + returnflag
    * prune the two fact scans before the join; the ranking input is one
    * row per customer after aggregation, and the top-10 is a
    * TakeOrderedAndProject, never a global sort. Ties break on custkey. */
  val qOlapReturned = Q(
    "q_olap_returned",
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |    AS BIGINT) AS rev_units
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY rev_units DESC, c_custkey
      |LIMIT 10""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("units"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(col("units").cast("decimal(38,0)")).cast("long").as("rev_units"))
      .orderBy(desc("rev_units"), asc("c_custkey"))
      .limit(10)
  }

  /** Order-priority service check (TPC-H Q4 shape): per priority, how
    * many orders in a quarter had at least one line item shipped more
    * than 90 days after ordering. The EXISTS is a LEFT SEMI join with an
    * equi key (orderkey) plus a non-equi residual (the lateness
    * comparison) — Catalyst keeps the shuffle keyed on the equi part and
    * evaluates the residual inside the join, so the plan distributes;
    * each order contributes at most one row regardless of how many lines
    * are late. */
  val qOlapOrderPriority = Q(
    "q_olap_order_priority",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Small-quantity outlier revenue (TPC-H Q17 shape): revenue from line
    * items ordering less than 20% of their part's average quantity — the
    * correlated-average-subquery classic. The correlation is decorrelated
    * into aggregate-then-join-back on l_partkey: both sides shuffle on the
    * same key (co-partitioned SMJ; the per-part frame grows with the
    * catalog, so no broadcast hint — AQE demotes when genuinely small).
    * The 20% comparison is rewritten EXACT-INTEGER: qty < sq/(5·cnt)
    * ⟺ 5·qty·cnt < sq over rounded BIGINTs, so the boundary cannot
    * flip on a division ulp on either engine. */
  val qOlapSmallQty = Q(
    "q_olap_small_qty",
    """WITH pa AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_cents
      |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
      |WHERE 5 * CAST(round(l_quantity) AS BIGINT) * cnt < sq""".stripMargin
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val pa = li.groupBy("l_partkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("sq"),
        count(lit(1)).as("cnt"))
    li.join(pa, "l_partkey")
      .filter(lit(5) * round(col("l_quantity")).cast("long") * col("cnt")
        < col("sq"))
      .agg(count(lit(1)).as("n_items"),
        sum(Det.units(col("l_extendedprice"), 100).cast("decimal(38,0)"))
          .cast("long").as("rev_cents"))
  }

  /** Revenue concentration (TPC-H Q11 shape): parts whose revenue exceeds
    * 1.5× the average part's share of GLOBAL revenue — group sums gated
    * by a scalar-subquery threshold over the whole fact table. The
    * per-part frame is aggregated ONCE and feeds both the one-row total
    * and the filtered output (persistScratch); the threshold comparison
    * 2·n_parts·u > 3·total is exact integer (decimal(38,0) vs HUGEINT —
    * both exact), so the cut cannot drift cross-engine. Share is the one
    * double division at the end, round6. */
  val qOlapRevConc = Q(
    "q_olap_rev_conc",
    """WITH pr AS (
      |  SELECT l_partkey,
      |    SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS u
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT SUM(u) AS tu, COUNT(*) AS np FROM pr)
      |SELECT l_partkey, CAST(u AS BIGINT) AS rev_cents,
      |  round(CAST(u AS DOUBLE) / CAST(tu AS DOUBLE), 6) AS share
      |FROM pr, t WHERE 2 * np * u > 3 * tu
      |ORDER BY l_partkey""".stripMargin
  ) { (spark, dir) =>
    import graft.sources.Scratch.PersistSyntax
    val pr = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 100)
        .cast("decimal(38,0)")).as("u"))
      .persistScratch() // feeds the one-row total AND the filtered output
    val t = pr.agg(sum("u").as("tu"), count(lit(1)).as("np"))
    pr.crossJoin(t)
      .filter(lit(2) * col("np") * col("u") > lit(3) * col("tu"))
      .select(col("l_partkey"), col("u").cast("long").as("rev_cents"),
        round(col("u").cast("double") / col("tu").cast("double"), 6).as("share"))
      .orderBy("l_partkey")
  }

  /** Sole-late supplier (TPC-H Q21 shape): suppliers who were the ONLY
    * late shipper on a finished multi-supplier order — a double
    * correlated-existential over the same fact table. Expressed as one
    * left-SEMI self-join (some other supplier exists on the order) plus
    * one left-ANTI self-join (no other supplier was also late), both
    * keyed on l_orderkey with the suppkey inequality and the lateness
    * bound as residual conditions. Scale: all three lineitem legs
    * shuffle on the SAME key (orderkey), so AQE reuses one exchange
    * partitioning across the chain; nothing is ever materialized per
    * row. The fixture draws l_shipdate independently of o_orderdate
    * (FIXTURES.md), so "late" = >2000 days keeps the late set rare
    * (~p97) the way Q21's receipt>commit does. */
  val qOlapSoleLate = Q(
    "q_olap_sole_late",
    """WITH l1 AS (
      |  SELECT l_orderkey, l_suppkey, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 2000 DAY)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l1.o_orderdate + INTERVAL 2000 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lateBound = col("o_orderdate") + expr("INTERVAL 2000 DAYS")
    val others = li.select(col("l_orderkey").as("x_ok"),
      col("l_suppkey").as("x_sk"), col("l_shipdate").as("x_ship"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lateBound)
      .join(others, // some OTHER supplier shares the order
        col("l_orderkey") === col("x_ok") && col("l_suppkey") =!= col("x_sk"),
        "left_semi")
      .join(others, // ... and none of them was also late
        col("l_orderkey") === col("x_ok") && col("l_suppkey") =!= col("x_sk")
          && col("x_ship") > lateBound,
        "left_anti")
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  /** Supplier variety per part class (TPC-H Q16 shape): COUNT(DISTINCT
    * supplier) per (brand, size) over an excluded-brand / excluded-type
    * part slice, with a NOT IN blacklist of negative-balance suppliers.
    * s_suppkey is non-nullable, so NOT IN is exactly a left-anti join
    * (no null-aware three-valued trap); the part slice is filter-then-
    * broadcast, so the fact scan output carries only surviving pairs
    * into the distinct aggregation. */
  val qOlapSuppVariety = Q(
    "q_olap_supp_variety",
    """SELECT p_brand, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 9, 17, 25, 33, 41, 49)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin
  ) { (spark, dir) =>
    val slice = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13"
        && !col("p_type").startsWith("PROMO")
        && col("p_size").isin(1, 9, 17, 25, 33, 41, 49))
      .select("p_partkey", "p_brand", "p_size")
    val blacklist = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_sk"))
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(slice), col("p_partkey") === col("l_partkey"))
      .join(blacklist, col("l_suppkey") === col("bad_sk"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_size"))
  }

  /** Dominant suppliers of a part family (TPC-H Q20 shape): suppliers
    * whose shipped quantity of some 'cold *' part exceeds 2× the part's
    * average per-supplier share — a semi-join chain gated by a two-level
    * aggregate. The share test `q·cnt > 2·tq` is exact-integer, so the
    * cut is partitioning- and engine-independent, and it self-scales:
    * "2× the average share" stays meaningful whether the part has 4
    * suppliers (sf0.001) or 400 (100 TB). Scale: the (supplier, part)
    * frame aggregates once (persistScratch) and feeds both the per-part
    * totals and the qualifying filter; supplier enrichment is a
    * left-semi, so no row multiplication. */
  val qOlapDominantSupp = Q(
    "q_olap_dominant_supp",
    """WITH ps AS (
      |  SELECT l_suppkey, l_partkey,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'cold %'
      |  GROUP BY l_suppkey, l_partkey),
      |pt AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS tq,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |       FROM ps GROUP BY l_partkey)
      |SELECT s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN
      |  (SELECT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
      |   WHERE ps.q * pt.cnt > 2 * pt.tq)
      |ORDER BY s_name""".stripMargin
  ) { (spark, dir) =>
    import graft.sources.Scratch.PersistSyntax
    val cold = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("cold "))
      .select("p_partkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(cold), col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .persistScratch() // feeds the per-part totals AND the share filter
    val pt = ps.groupBy("l_partkey")
      .agg(sum("q").as("tq"), count(lit(1)).as("cnt"))
    val qual = ps.join(pt, "l_partkey")
      .filter(col("q") * col("cnt") > lit(2) * col("tq"))
      .select("l_suppkey")
    Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  /** Min-cost supplier per part (TPC-H Q2 shape): for each small part,
    * every supplier whose cheapest shipped line hits the part's global
    * minimum — a correlated-MIN equality. Equality on floats would be a
    * cross-engine landmine; on exact cents it is safe, and ties keep ALL
    * minimal suppliers on both engines. Scale: decorrelated by hand into
    * aggregate + join (exactly what Catalyst's RewriteCorrelatedScalar-
    * Subquery would emit): the (part, supplier) min-frame aggregates
    * once (persistScratch), the per-part min derives from it, and the
    * part filter is applied only at the final enrichment — legal because
    * a per-part MIN over all suppliers is unchanged by a part-attribute
    * filter, so the oracle's unfiltered correlated form agrees. */
  val qOlapMinCost = Q(
    "q_olap_min_cost",
    """WITH c AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT p_partkey, s_name, n_name, CAST(c.cents AS BIGINT) AS min_cents
      |FROM part JOIN c ON p_partkey = c.l_partkey
      |JOIN supplier ON c.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size <= 5
      |  AND c.cents = (SELECT MIN(c2.cents) FROM c c2
      |                 WHERE c2.l_partkey = p_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin
  ) { (spark, dir) =>
    import graft.sources.Scratch.PersistSyntax
    val c = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(Det.units(col("l_extendedprice"), 100)).as("cents"))
      .persistScratch() // feeds the per-part min AND the equality probe
    val minc = c.groupBy("l_partkey").agg(min("cents").as("mincents"))
    val small = Tables.part(spark, dir)
      .filter(col("p_size") <= 5)
      .select("p_partkey")
    c.join(minc, "l_partkey")
      .filter(col("cents") === col("mincents"))
      .join(broadcast(small), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(spark, dir)
        .select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("s_name"), col("n_name"),
        col("cents").cast("long").as("min_cents"))
      .orderBy("p_partkey", "s_name")
  }

  /** Product-line profit by nation and year (TPC-H Q9 shape): a part-slice
    * fact join enriched by supplier nation and order year, with profit =
    * revenue − cost proxy (qty × p_retailprice / 10; the fixture has no
    * partsupp, see the object scaladoc). Both terms are rounded to exact
    * integer units SEPARATELY before the subtraction, so the per-line
    * profit is the same integer on both engines and the group sum is
    * partition-order independent. Scale: the part slice filters at the
    * lineitem scan via broadcast, the orders join carries only (orderkey,
    * year), and the final group-by domain is nation × year — tiny,
    * map-side combinable. */
  val qOlapProfit = Q(
    "q_olap_profit",
    """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
      |         - CAST(round(l_quantity * p_retailprice * 1000) AS BIGINT))
      |    AS BIGINT) AS profit_units
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year DESC""".stripMargin
  ) { (spark, dir) =>
    val slice = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val units =
      Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000) -
        Det.units(col("l_quantity") * col("p_retailprice"), 1000)
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(slice), col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_year")
      .agg(sum(units.cast("decimal(38,0)")).cast("long").as("profit_units"))
      .orderBy(col("n_name"), desc("o_year"))
  }

  /** Priority mix of slow-shipping lines (TPC-H Q12 shape): lines that
    * shipped ≥60 days after their order date, bucketed by line status,
    * with the order-priority mix as two conditional CASE sums — the
    * "pivot an attribute into measure columns" report idiom. The lateness
    * predicate references both sides, so it is a post-join residual; the
    * group-by domain is |l_linestatus| = 2 rows, fully map-side
    * combinable after the one orderkey shuffle. */
  val qOlapLinePrio = Q(
    "q_olap_line_prio",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin
  ) { (spark, dir) =>
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!hi, 1).otherwise(0)).cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Year-over-year revenue growth per nation — the classic trend report
    * every warehouse dashboard runs: aggregate to (nation, year), then a
    * per-nation lag window turns the series into growth ratios. Scale
    * shape: the heavy work is ONE exchange for the (nation, year)
    * aggregate (partial map-side sums of exact cents), after which the
    * window moves only the ~|nations|×|years| result — at 100 TB the
    * window input is thousands of rows regardless of fact size. Revenue
    * follows the Det discipline; the growth ratio divides two identical
    * doubles on both engines, rounded to 6 dp. First year per nation is
    * NULL growth (no prior), which both engines agree on; a zero-revenue
    * prior year also yields NULL growth (DF: when(prev =!= 0), SQL:
    * NULLIF) — without the guard ANSI mode throws DIVIDE_BY_ZERO and one
    * degenerate group would kill a 100 TB job. */
  val qOlapYoy = Q(
    "q_olap_yoy",
    """WITH yr AS (
      |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, 2)
      |SELECT n_name, o_year,
      |  rev_cents / 100.0 AS revenue,
      |  round((rev_cents / 100.0 - lag(rev_cents / 100.0)
      |      OVER (PARTITION BY n_name ORDER BY o_year))
      |    / nullif(lag(rev_cents / 100.0)
      |      OVER (PARTITION BY n_name ORDER BY o_year), 0), 6) AS yoy_growth
      |FROM yr
      |ORDER BY n_name, o_year""".stripMargin
  ) { (spark, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy("o_year")
    val prev = lag(col("revenue"), 1).over(w)
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(Det.exactSum(col("o_totalprice"), 100).as("revenue"))
      .select(col("n_name"), col("o_year"), col("revenue"),
        round((col("revenue") - prev) / when(prev =!= 0, prev), 6).as("yoy_growth"))
      .orderBy("n_name", "o_year")
  }

  def all: Seq[Q] = Seq(qOlapCustDist, qOlapBigOrders, qOlapDisjunct,
    qOlapMktShare, qOlapTopSupplier, qOlapLapsedRich, qOlapVolumeShip,
    qOlapReturned, qOlapOrderPriority, qOlapSmallQty, qOlapRevConc,
    qOlapSoleLate, qOlapSuppVariety, qOlapDominantSupp, qOlapMinCost,
    qOlapProfit, qOlapLinePrio, qOlapYoy)
}
