package graft.operators

import graft.sources.Scratch.PersistSyntax
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.{Det, Salting}
import graft.sources.Tables

/** OLAP reporting operators beyond SURVEY §2's core aggregates: a graded
  * salted-join (skew mitigation as a first-class, oracle-checked result,
  * not just a test), a fixed-width histogram, window-share ratios, and a
  * deterministic per-group mode.
  *
  * All numeric outputs follow the Det discipline: exact integer units
  * through every shuffle, one double division at the end — so results are
  * identical on any partitioning, 4 threads or 1000 executors.
  */
object OlapExtras {

  /** Salted aggregate-join-back: per returnflag, how many line items
    * exceed that flag's mean quantity. The join key has THREE distinct
    * values — the canonical hot-key shape where hash partitioning
    * collapses to 3 reducers and AQE cannot split a single key's bucket.
    * Salting.saltedJoin spreads each hot key over 8 salt sub-keys; the
    * result is provably identical to the unsalted join (salt only refines
    * the partitioning). The mean comparison is exact:
    * units·n > Σunits avoids the double division entirely. */
  val qJoinSkewSalt = Q(
    "q_join_skew_salt",
    """WITH st AS (
      |  SELECT l_returnflag,
      |    SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag,
      |  CAST(COUNT(*) FILTER (WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * st.n > st.s)
      |       AS BIGINT) AS n_above,
      |  COUNT(*) AS n_total
      |FROM lineitem l JOIN st ON l.l_returnflag = st.l_returnflag
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), Det.units(col("l_quantity"), 100).as("q_units"))
    val stats = li.groupBy("l_returnflag")
      .agg(sum(col("q_units").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
    Salting.saltedJoin(li, stats, "l_returnflag", 8)
      .groupBy("l_returnflag")
      .agg(count(when(col("q_units") * col("n") > col("s"), 1)).as("n_above"),
        count(lit(1)).as("n_total"))
      .orderBy("l_returnflag")
  }

  /** Fixed-width histogram of order totals (25k-wide buckets, capped at
    * bucket 19): integer bucket arithmetic on exact cents, partial→final
    * count per bucket — the data-profiling pass that needs exactly one
    * scan and a 20-row shuffle. */
  val qAggHist = Q(
    "q_agg_hist",
    """SELECT CAST(LEAST(19, CAST(round(o_totalprice * 100) AS BIGINT) // 2500000) AS INT)
      |    AS bucket,
      |  COUNT(*) AS n_orders,
      |  CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
      |  CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM orders
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(Det.units(col("o_totalprice"), 100).as("cents"))
      .select(least(lit(19L), expr("cents div 2500000")).cast("int").as("bucket"),
        col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .orderBy("bucket")
  }

  /** Revenue share of each nation within its region: a whole-partition
    * window aggregate (no ORDER BY → unbounded frame) over exact unit
    * sums; the share is one double division of two exact integers,
    * rounded to 6 dp on both engines. */
  val qWinShare = Q(
    "q_win_share",
    """WITH nat AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS u
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name,
      |  CAST(u / 100.0 AS DOUBLE) AS revenue,
      |  round(CAST(u AS DOUBLE) / CAST(SUM(u) OVER (PARTITION BY r_name) AS DOUBLE), 6)
      |    AS share
      |FROM nat
      |ORDER BY r_name, n_name""".stripMargin
  ) { (spark, dir) =>
    val nat = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      // DECIMAL(38,0) accumulator, as Det.exactSum: a BIGINT sum of cents
      // can wrap at 1e11-row groups; DuckDB's SUM(BIGINT) is HUGEINT
      .agg(sum(Det.units(col("o_totalprice"), 100).cast("decimal(38,0)")).as("u"))
    val w = Window.partitionBy("r_name")
    nat.select(col("r_name"), col("n_name"),
      (col("u") / 100.0).cast("double").as("revenue"),
      round(col("u").cast("double") / sum("u").over(w).cast("double"), 6).as("share"))
      .orderBy("r_name", "n_name")
  }

  /** Deterministic per-group mode: the most frequent event_type per user
    * band, ties broken by type name — count-then-rank, never a
    * collect_list. Two aggregations on the same band key = one effective
    * partitioning at scale. */
  val qAggMode = Q(
    "q_agg_mode",
    """SELECT band, event_type AS mode_type, n FROM (
      |  SELECT user_id % 10 AS band, event_type, COUNT(*) AS n,
      |    CAST(row_number() OVER (PARTITION BY user_id % 10
      |      ORDER BY COUNT(*) DESC, event_type) AS INT) AS rk
      |  FROM events GROUP BY band, event_type)
      |WHERE rk = 1
      |ORDER BY band""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("band").orderBy(desc("n"), asc("event_type"))
    Tables.events(spark, dir)
      .groupBy((col("user_id") % 10).as("band"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("band"), col("event_type").as("mode_type"), col("n"))
      .orderBy("band")
  }

  /** CDC / lakehouse compaction: latest-record-wins per key — keep each
    * customer's most recent order (orderdate DESC, orderkey DESC tiebreak)
    * and roll the survivors up per status. The rank-1 window plans with a
    * pre-shuffle WindowGroupLimit (each task keeps one row per local key
    * before the exchange), which is exactly the merge-on-read compaction
    * shape: the shuffle carries one candidate per (task, key), never the
    * full history. */
  val qCdcCompact = Q(
    "q_cdc_compact",
    """SELECT o_orderstatus, COUNT(*) AS n_latest,
      |  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
      |FROM (
      |  SELECT o_orderstatus, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_latest"),
        Det.exactSum(col("o_totalprice"), 100).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** CDC / SCD type-2 interval construction — the other half of real CDC
    * compaction (q_cdc_compact is latest-wins; warehouses ALSO need the
    * full validity-interval history). Each change event (here: a
    * customer's order, keyed o_custkey, effective o_orderdate) becomes a
    * versioned row [valid_from, valid_to) where valid_to is the next
    * change's timestamp and NULL marks the open (current) version.
    *
    * One window shuffle on the key, one pass, no self-join — lead() gives
    * the interval end directly, so at 100 TB the cost is exactly one
    * exchange of the change log plus a per-key sort, the same shape as
    * any merge-on-read compaction. Ties on the effective date are broken
    * by o_orderkey so the interval chain is deterministic cross-engine. */
  val qCdcScd2 = Q(
    "q_cdc_scd2",
    """SELECT o_custkey, o_orderkey, o_orderstatus,
      |  o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |  CAST(CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) IS NULL THEN 1 ELSE 0 END AS INT)
      |    AS is_current
      |FROM orders
      |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val nextChange = lead(col("o_orderdate"), 1).over(w)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"),
        nextChange.as("valid_to"),
        when(nextChange.isNull, 1).otherwise(0).cast("int").as("is_current"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** MERGE / upsert — the third lakehouse CDC primitive next to
    * latest-wins compaction (q_cdc_compact) and SCD2 history
    * (q_cdc_scd2): apply a keyed change batch to a base table with
    * WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT semantics.
    * Spark has no MERGE INTO over plain parquet, and the correct
    * Spark-native expression is exactly this plan: one FULL OUTER
    * equi-join of base and changes on the key, with the action decided
    * per row by which side is present. At 100 TB that is one sort-merge
    * (or co-partitioned, with bucketed tables) join of table and batch —
    * the same shape Delta/Iceberg execute under their MERGE syntax — and
    * never a per-row lookup loop.
    *
    * Change batch here: each customer's latest order (the q_cdc_compact
    * window), with odd customer keys NEGATED to model a stream that also
    * carries NEW keys — negation is disjoint from the positive custkey
    * space at every scale factor (an additive shift collides once real
    * keys pass the shift amount, ~SF 7) — so all three outcomes
    * (updated / inserted / unchanged) are exercised and counted in the
    * output. Values pass through unchanged (no float arithmetic), so the
    * cross-engine hash is exact. */
  val qMergeUpsert = Q(
    "q_merge_upsert",
    """WITH ch AS (
      |  SELECT CASE WHEN o_custkey % 2 = 1 THEN -o_custkey
      |              ELSE o_custkey END AS k,
      |    o_orderstatus AS new_status, o_totalprice AS new_bal
      |  FROM (
      |    SELECT o_custkey, o_orderstatus, o_totalprice,
      |      row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders)
      |  WHERE rn = 1)
      |SELECT COALESCE(b.c_custkey, ch.k) AS key,
      |  CASE WHEN b.c_custkey IS NULL THEN 'inserted'
      |       WHEN ch.k IS NULL THEN 'unchanged'
      |       ELSE 'updated' END AS merge_action,
      |  CASE WHEN ch.k IS NULL THEN b.c_acctbal ELSE ch.new_bal END AS acctbal,
      |  ch.new_status AS status
      |FROM customer b FULL OUTER JOIN ch ON b.c_custkey = ch.k
      |ORDER BY key""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    val changes = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        when(col("o_custkey") % 2 === 1, -col("o_custkey"))
          .otherwise(col("o_custkey")).as("k"),
        col("o_orderstatus").as("new_status"),
        col("o_totalprice").as("new_bal"))
    Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal")
      .join(changes, col("c_custkey") === col("k"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("k")).as("key"),
        when(col("c_custkey").isNull, lit("inserted"))
          .when(col("k").isNull, lit("unchanged"))
          .otherwise(lit("updated")).as("merge_action"),
        when(col("k").isNull, col("c_acctbal")).otherwise(col("new_bal"))
          .as("acctbal"),
        col("new_status").as("status"))
      .orderBy("key")
  }

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * orders ⋈ lineitem, revenue per order, top 10. The canonical
    * selective-dim → big-fact plan: both date filters push to the scans,
    * the customer filter cuts the orders join input, and the top-10 runs
    * as TakeOrderedAndProject on the rounded exact-unit revenue (ties
    * broken by orderkey, so the cut is identical cross-engine).
    * price·(1−disc) is exact at 1e-4 units (2 dp × 2 dp). */
  val qOlapShipPriority = Q(
    "q_olap_ship_priority",
    """SELECT l_orderkey, o_orderdate,
      |  SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |    / 10000.0 AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15'
      |  AND l_shipdate > TIMESTAMP '1997-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(Det.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")),
        10000).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): the 6-way join where customer
    * and supplier must share a nation, revenue per nation in one region
    * and year. Dims broadcast; the fact⋈fact lineitem⋈orders equi-join is
    * the only big shuffle; the c_nationkey = s_nationkey residual rides
    * on the joined row. */
  val qOlapLocalSupp = Q(
    "q_olap_local_supp",
    """SELECT n_name,
      |  SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |    / 10000.0 AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(Det.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")),
        10000).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q14 shape (promotion effect): the share of one month's revenue
    * coming from PROMO-type parts — a conditional-aggregate ratio over the
    * part ⋈ lineitem join. Both the numerator (CASE-gated) and the
    * denominator are exact 1e-4-unit integer sums; the percentage is one
    * double division of the two, rounded to 6 dp. The part side
    * broadcasts; the date filter prunes the fact scan. */
  val qOlapPromoRatio = Q(
    "q_olap_promo_ratio",
    """SELECT
      |  round(100.0 * SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
      |      ELSE 0 END)
      |    / SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)),
      |    6) AS promo_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin
  ) { (spark, dir) =>
    val units = Det.units(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", units).otherwise(0L))
          / sum(units), 6).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }


  /** Exponentially-weighted moving average of daily revenue — EXACTLY.
    * EWMA is inherently recursive, but with decay 1/2 and a 16-day
    * horizon the weights are powers of two, so cents x 2^(15-gap) stays
    * integer: the weighted sum accumulates in DECIMAL(38,0) with zero
    * float error and one double division at the end. The lookback is a
    * bounded range join on the integer day index (16 rows per anchor
    * day) — the same per-key-bounded shape as the WAU lookback, never a
    * growing frame. Tail truncation (gap > 15) is part of the operator's
    * definition, identically on both engines. */
  val qOlapEwma = Q(
    "q_olap_ewma",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |    CAST(datediff('day', DATE '1970-01-01',
      |         CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS ep,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY day, ep),
      |j AS (
      |  SELECT a.day, a.ep,
      |    SUM(b.cents * CAST(power(2, 15 - (a.ep - b.ep)) AS BIGINT)) AS wsum,
      |    SUM(CAST(power(2, 15 - (a.ep - b.ep)) AS BIGINT)) AS wtot
      |  FROM d a JOIN d b ON b.ep BETWEEN a.ep - 15 AND a.ep
      |  GROUP BY a.day, a.ep)
      |SELECT day, round(CAST(wsum AS DOUBLE) / wtot / 100.0, 2) AS ewma
      |FROM j ORDER BY day""".stripMargin
  ) { (spark, dir) =>
    val d = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(sum(Det.units(col("o_totalprice"), 100)).as("cents"))
      .withColumn("ep", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      .persistScratch() // both sides of the bounded lookback join
    val a = d.select(col("day"), col("ep"))
    val b = d.select(col("ep").as("bep"), col("cents"))
    a.join(b, col("bep").between(col("ep") - 15, col("ep")))
      .select(col("day"), col("ep"),
        (col("cents") * pow(lit(2), lit(15) - (col("ep") - col("bep"))).cast("long"))
          .cast("decimal(38,0)").as("w"),
        pow(lit(2), lit(15) - (col("ep") - col("bep"))).cast("long")
          .cast("decimal(38,0)").as("wt"))
      .groupBy("day", "ep")
      .agg(sum("w").as("wsum"), sum("wt").as("wtot"))
      .select(col("day"),
        // 2 dp, not 6: the value is cents-scale (~1e6), so 6 dp sits at
        // double's 13th significant digit where the engines' division can
        // differ by an ulp (observed once in 2399 rows at sf0.01)
        round(col("wsum").cast("double") / col("wtot").cast("double") / 100.0, 2)
          .as("ewma"))
      .orderBy("day")
  }


  /** RFM segmentation: recency (days since the customer's last order,
    * against the corpus max date), frequency (order count), monetary
    * (exact cents) — each cut into two fixed bands, customers rolled up
    * per 8-way segment. All integer comparisons against integer
    * thresholds: the segment assignment cannot float-drift. The corpus
    * max date is a 1-row aggregate joined in (broadcast scalar), then
    * everything is one customer-keyed aggregation. */
  val qOlapRfm = Q(
    "q_olap_rfm",
    """WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
      |c AS (
      |  SELECT o_custkey,
      |    CAST(datediff('day', CAST(max(o_orderdate) AS DATE), CAST(min(mxd) AS DATE))
      |         AS BIGINT) AS rec_days,
      |    COUNT(*) AS freq,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders, mx GROUP BY o_custkey)
      |SELECT concat(
      |    CASE WHEN rec_days <= 365 THEN 'R1' ELSE 'R0' END,
      |    CASE WHEN freq >= 10 THEN 'F1' ELSE 'F0' END,
      |    CASE WHEN cents >= 15000000 THEN 'M1' ELSE 'M0' END) AS segment,
      |  COUNT(*) AS n_customers,
      |  SUM(cents) / 100.0 / COUNT(*) AS avg_revenue
      |FROM c GROUP BY segment
      |ORDER BY segment""".stripMargin
  ) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    val mx = o.agg(max("o_orderdate").as("mxd"))
    val c = o.crossJoin(broadcast(mx))
      .groupBy("o_custkey")
      .agg(
        datediff(to_date(max("o_orderdate")), to_date(min("mxd")))
          .cast("long").as("rec_days_neg"),
        count(lit(1)).as("freq"),
        sum(Det.units(col("o_totalprice"), 100)).as("cents"))
      .withColumn("rec_days", -col("rec_days_neg"))
    c.select(
        concat(
          when(col("rec_days") <= 365, "R1").otherwise("R0"),
          when(col("freq") >= 10, "F1").otherwise("F0"),
          when(col("cents") >= 15000000L, "M1").otherwise("M0")).as("segment"),
        col("cents"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("cents").cast("decimal(38,0)")).cast("double") / 100.0
          / count(lit(1))).as("avg_revenue"))
      .orderBy("segment")
  }

  def all: Seq[Q] = Seq(qJoinSkewSalt, qAggHist, qWinShare, qAggMode, qCdcCompact,
    qCdcScd2, qMergeUpsert, qOlapShipPriority, qOlapLocalSupp, qOlapPromoRatio, qOlapEwma,
    qOlapRfm)
}
