package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.functions.Det._
import graft.sources.Tables

/** Join operators (SURVEY.md §2.3): broadcast star join, shuffle fact⋈fact,
  * outer/semi/anti, theta, equi+range residual, as-of.
  *
  * Scale notes per operator are on each query. General rule: dims
  * (region/nation/supplier) are broadcast explicitly — at 100 TB they stay
  * small, so the fact side never shuffles for them; fact⋈fact joins shuffle
  * both sides on the join key once (sort-merge), and AQE converts to
  * broadcast at runtime if a filtered side turns out small.
  */
object Joins {

  /** Q05 — multi-way star join. nation/region broadcast explicitly;
    * customer is left to the planner (broadcast at these SFs, shuffle at
    * 100 TB — exactly the decision AQE should own, not the query author). */
  val q05 = Q(
    "q_join_star",
    s"""SELECT r_name, n_name,
       |  ${sqlExactSum("o_totalprice", 100)} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(exactSum(col("o_totalprice"), 100).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** Q06 — fact⋈fact equi join (sort-merge at scale): lineitem⋈orders on
    * orderkey. Both sides shuffle on the key exactly once; the aggregation
    * after it is partial→final so the second shuffle carries 5 rows. */
  val q06 = Q(
    "q_join_big",
    s"""SELECT o_orderpriority,
       |  ${sqlExactSum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Q07 — left outer join + null handling: per mktsegment, how many
    * (customer, order) rows, how many matched, how many customers had no
    * order at all (each orderless customer contributes exactly one
    * null-extended row, so the count is exact). */
  val q07 = Q(
    "q_join_left",
    s"""SELECT c_mktsegment,
       |  COUNT(*) AS n_rows,
       |  COUNT(o_orderkey) AS n_matched,
       |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless,
       |  ${sqlExactSum("COALESCE(o_totalprice, 0)", 100)} AS sum_price
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_matched"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long")
          .as("n_orderless"),
        exactSum(coalesce(col("o_totalprice"), lit(0.0)), 100).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** Q08 — left semi join (EXISTS): customers with ≥1 urgent order. The
    * semi join never duplicates the left side and the right side is reduced
    * to its join key — the cheapest existence check Spark has. */
  val q08 = Q(
    "q_join_semi",
    s"""SELECT c_mktsegment, COUNT(*) AS n_custs,
       |  ${sqlExactSum("c_acctbal", 100)} AS sum_bal
       |FROM customer
       |WHERE EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"), exactSum(col("c_acctbal"), 100).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  /** Q09 — left anti join (NOT EXISTS): parts that never shipped in
    * quantity > 45. The filter on the right side runs BEFORE the join and
    * prunes ~90% of lineitem at the scan. */
  val q09 = Q(
    "q_join_anti",
    """SELECT p_brand, COUNT(*) AS n_parts, MIN(p_partkey) AS min_partkey
      |FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin
  ) { (spark, dir) =>
    Tables.part(spark, dir)
      .join(
        Tables.lineitem(spark, dir).filter(col("l_quantity") > 45),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("min_partkey"))
      .orderBy("p_brand")
  }

  /** Q10 — theta (pure-inequality) join: supplier pairs where one balance
    * is less than half the other. No equi key ⇒ BroadcastNestedLoopJoin;
    * supplier is a dim that stays broadcastable at 100 TB. A theta join
    * over two FACT tables would be quadratic and is deliberately not in
    * the inventory — band it (Q11) or block it (Q32) instead. */
  val q10 = Q(
    "q_join_theta",
    """SELECT a.s_nationkey AS nationkey, COUNT(*) AS n_pairs
      |FROM supplier a, supplier b
      |WHERE a.s_acctbal * 2 < b.s_acctbal
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    val a = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nationkey"), col("s_acctbal").as("a_bal"))
    val b = Tables.supplier(spark, dir).select(col("s_acctbal").as("b_bal"))
    a.join(b, col("a_bal") * 2 < col("b_bal"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("nationkey")
  }

  /** Q11 — equi + range residual join: lineitem⋈orders on orderkey with a
    * shipdate-within-120-days band. The equi key drives the shuffle; the
    * band is a residual filter evaluated inside the join — no extra pass. */
  val q11 = Q(
    "q_join_range",
    s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |  COUNT(*) AS n_items,
       |  ${sqlExactSum("l_extendedprice", 100)} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  AND l_shipdate >= o_orderdate
       |  AND l_shipdate <= o_orderdate + INTERVAL 120 DAY
       |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_items"), exactSum(col("l_extendedprice"), 100).as("sum_price"))
      .orderBy("o_year")
  }

  /** Q12 — as-of join, window formulation: for each purchase event, the
    * user's most recent strictly-prior click. One shuffle on user_id, one
    * sort per partition — the classic scalable as-of shape (vs a join +
    * per-row max which re-shuffles). The oracle uses the same window SQL;
    * DuckDB's native ASOF JOIN produces the same rows but this form pins
    * the strict-< and tiebreak semantics explicitly on both engines. */
  val q12 = Q(
    "q_join_asof",
    """SELECT event_id, user_id, ts, prev_click_ts,
      |  (epoch_us(ts) - epoch_us(prev_click_ts)) / 1000000.0 AS secs_since_click
      |FROM (
      |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("prev_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("prev_click_ts"),
        ((unix_micros(col("ts")) - unix_micros(col("prev_click_ts"))) / lit(1000000.0))
          .as("secs_since_click"))
      .orderBy("event_id")
  }

  /** Forward as-of join: for each purchase, the user's NEXT click — the
    * mirror direction of Q12, via first_value over the following frame.
    * Same single-shuffle-per-user scalable shape. */
  val qJoinAsofFwd = Q(
    "q_join_asof_fwd",
    """SELECT event_id, user_id, ts, next_click_ts,
      |  (epoch_us(next_click_ts) - epoch_us(ts)) / 1000000.0 AS secs_to_click
      |FROM (
      |  SELECT *, first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .withColumn("next_click_ts",
        first(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("next_click_ts"),
        ((unix_micros(col("next_click_ts")) - unix_micros(col("ts"))) / lit(1000000.0))
          .as("secs_to_click"))
      .orderBy("event_id")
  }

  /** Nearest as-of join: for each purchase, the user's click CLOSEST in
    * time, looking both directions — the sensor-fusion / log-alignment
    * variant the backward (q_join_asof) and forward (q_join_asof_fwd)
    * joins bracket. Both candidate frames ride the SAME window
    * partitioning and sort (user_id; ts, event_id), so the plan stays one
    * shuffle + one per-partition sort with two frame evaluations — never
    * a join against the click set per direction. Ties (equidistant prev
    * and next) resolve BACKWARD, pinned by `<=` on both engines, so the
    * pick is deterministic and hash-comparable. */
  val qJoinAsofNear = Q(
    "q_join_asof_near",
    """SELECT event_id, user_id, ts,
      |  CASE WHEN prev_ts IS NULL THEN next_ts
      |       WHEN next_ts IS NULL THEN prev_ts
      |       WHEN epoch_us(ts) - epoch_us(prev_ts)
      |            <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
      |       ELSE next_ts END AS nearest_click_ts,
      |  CASE WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
      |       WHEN next_ts IS NULL THEN 'prev'
      |       WHEN prev_ts IS NULL THEN 'next'
      |       WHEN epoch_us(ts) - epoch_us(prev_ts)
      |            <= epoch_us(next_ts) - epoch_us(ts) THEN 'prev'
      |       ELSE 'next' END AS direction
      |FROM (
      |  SELECT *,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts,
      |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val back = order.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = order.rowsBetween(1, Window.unboundedFollowing)
    val clickTs = when(col("event_type") === "click", col("ts"))
    val prevCloser = unix_micros(col("ts")) - unix_micros(col("prev_ts")) <=
      unix_micros(col("next_ts")) - unix_micros(col("ts"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", last(clickTs, ignoreNulls = true).over(back))
      .withColumn("next_ts", first(clickTs, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("prev_ts").isNull, col("next_ts"))
          .when(col("next_ts").isNull, col("prev_ts"))
          .when(prevCloser, col("prev_ts"))
          .otherwise(col("next_ts")).as("nearest_click_ts"),
        when(col("prev_ts").isNull && col("next_ts").isNull, lit(null))
          .when(col("next_ts").isNull, lit("prev"))
          .when(col("prev_ts").isNull, lit("next"))
          .when(prevCloser, lit("prev"))
          .otherwise(lit("next")).as("direction"))
      .orderBy("event_id")
  }

  /** Correlated scalar subquery — exercises Catalyst's decorrelation
    * (RewriteCorrelatedScalarSubquery turns the per-row subquery into an
    * aggregate + left outer join; verify with explain that NO per-row
    * re-execution survives). SQL path: the DataFrame API has no scalar-
    * subquery constructor. */
  val qSubqueryScalar = Q(
    "q_subquery_scalar",
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT CAST(MAX(l_quantity) AS DOUBLE) FROM lineitem
      |   WHERE l_orderkey = o_orderkey) AS max_qty
      |FROM orders
      |WHERE o_orderkey <= 5000
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    Tables.orders(spark, dir).createOrReplaceTempView("sq_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("sq_lineitem")
    spark.sql(
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT CAST(MAX(l_quantity) AS DOUBLE) FROM sq_lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_qty
        |FROM sq_orders
        |WHERE o_orderkey <= 5000
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated PREDICATE subqueries (TPC-H Q17 shape): small-quantity
    * orders for one brand, where "small" compares each row against its
    * part's aggregate — `qty·5·cnt < sum` is the exact-integer form of
    * `qty < 0.2·avg` (quantities are integral doubles `[VER]`), so the
    * boundary can't flip between engines. Catalyst decorrelates both
    * scalar subqueries into aggregate + join (and MergeScalarSubqueries
    * can fuse them: same correlation key, same relation) — per-row
    * re-execution never survives planning, which is what makes the shape
    * usable at 100 TB. */
  val qSubqueryCorr = Q(
    "q_subquery_corr",
    """SELECT p_brand,
      |  CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_cents
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand IN ('Brand#11', 'Brand#12')
      |  AND CAST(l_quantity AS BIGINT) * 5
      |      * (SELECT COUNT(*) FROM lineitem l2
      |         WHERE l2.l_partkey = part.p_partkey)
      |      < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |         FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir).createOrReplaceTempView("sq2_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("sq2_part")
    spark.sql(
      """SELECT p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM sq2_lineitem, sq2_part
        |WHERE p_partkey = l_partkey
        |  AND p_brand IN ('Brand#11', 'Brand#12')
        |  AND CAST(l_quantity AS BIGINT) * 5
        |      * (SELECT COUNT(*) FROM sq2_lineitem l2
        |         WHERE l2.l_partkey = sq2_part.p_partkey)
        |      < (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |         FROM sq2_lineitem l2 WHERE l2.l_partkey = sq2_part.p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Full outer join — the reconciliation audit: every customer and every
    * order key appears exactly once, bucketed into matched / customer-only
    * / order-only (order-only is empty here by referential integrity, and
    * the query PROVES that rather than assuming it). The aggregate over
    * the join's null pattern is the standard data-quality sweep two
    * ingest feeds get before being merged. */
  val qJoinFull = Q(
    "q_join_full",
    """SELECT
      |  CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'matched'
      |       WHEN o_custkey IS NULL THEN 'customer_only'
      |       ELSE 'order_only' END AS bucket,
      |  COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_custs
      |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin
  ) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "matched")
          .when(col("o_custkey").isNull, "customer_only")
          .otherwise("order_only").as("bucket"),
        col("c_custkey"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), countDistinct("c_custkey").as("n_custs"))
      .orderBy("bucket")
  }

  /** Blocked fuzzy self-join — entity resolution over the part-name
    * dictionary. Collapse part to DISTINCT names first (a map-side-combine
    * groupBy: at 100 TB the name dictionary is orders of magnitude smaller
    * than the fact table, so everything after the first agg runs on the
    * dictionary), block on the last name token (the head noun — the
    * standard blocking key: candidate entities must agree on their type
    * word), and evaluate levenshtein only inside blocks, behind a cheap
    * length-difference prefilter. Edit distance never sees a cross-block
    * pair, so cost is Σ_blk |blk|² over DICTIONARY entries, never table
    * rows. Output: name pairs within edit distance 4 plus the number of
    * part rows a merge of the pair would touch. */
  val qJoinFuzzy = Q(
    "q_join_fuzzy",
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name),
      |blocked AS (
      |  SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk
      |  FROM names)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
      |  a.n_parts + b.n_parts AS n_affected
      |FROM blocked a JOIN blocked b
      |  ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE abs(len(a.p_name) - len(b.p_name)) <= 4
      |  AND levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY name_a, name_b""".stripMargin
  ) { (spark, dir) =>
    import graft.sources.Scratch.PersistSyntax
    val names = Tables.part(spark, dir)
      .groupBy("p_name").agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      .persistScratch() // both sides of the dictionary self-join
    val a = names.select(col("p_name").as("name_a"),
      col("n_parts").as("a_n"), col("blk"))
    val b = names.select(col("p_name").as("name_b"),
      col("n_parts").as("b_n"), col("blk").as("b_blk"))
    a.join(b, col("blk") === col("b_blk") && col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 4 &&
        levenshtein(col("name_a"), col("name_b")) <= 4)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("int").as("dist"),
        (col("a_n") + col("b_n")).as("n_affected"))
      .orderBy("name_a", "name_b")
  }

  /** Interval-overlap join with NO equi key: purchase activity windows ×
    * error windows, matched on temporal overlap alone (the incident-vs-
    * deploy correlation shape). The naive form is a quadratic nested
    * loop; the scalable decomposition buckets time into hours, expands
    * each interval to the hour buckets it covers (durations are bounded
    * ≤45/30 min, so ≤2 buckets per interval), and equi-joins on the
    * bucket — both sides shuffle ONCE on a high-cardinality key. A pair
    * overlapping in two shared buckets would double-count, so the join
    * keeps a pair only in the bucket containing max(a_start, b_start)
    * (= the overlap's first instant, which both intervals cover by
    * definition) — exactly-once without a distinct pass over the pair
    * stream. Skewed hours (incident storms) take the q_join_skew_salt
    * treatment. The oracle is the direct inequality join (DuckDB plans
    * its IEJoin), so the bucketing is verified against independent
    * semantics. Durations derive from the value column in exact integer
    * units (positive-mod so hostile negatives can't flip sequence()
    * direction); non-finite values yield NULL bounds and are dropped
    * loudly by the IS NOT NULL guard on both engines. */
  val qJoinInterval = Q(
    "q_join_interval",
    s"""WITH a AS (
       |  SELECT event_id AS a_id, ts AS a_s,
       |    ts + to_minutes(CAST(((${sqlUnitsWide("value", 100)} % 45) + 45) % 45 + 1 AS BIGINT)) AS a_e
       |  FROM events WHERE event_type = 'purchase'),
       |b AS (
       |  SELECT event_id AS b_id, ts AS b_s,
       |    ts + to_minutes(CAST(((${sqlUnitsWide("value", 100)} % 30) + 30) % 30 + 1 AS BIGINT)) AS b_e
       |  FROM events WHERE event_type = 'error')
       |SELECT CAST(date_trunc('day', a_s) AS TIMESTAMP) AS day,
       |  COUNT(*) AS n_pairs,
       |  COUNT(DISTINCT a_id) AS n_purchases,
       |  CAST(SUM(epoch_us(least(a_e, b_e)) - epoch_us(greatest(a_s, b_s))) AS BIGINT) AS overlap_us
       |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
       |WHERE a_e IS NOT NULL AND b_e IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    def intervals(tpe: String, mod: Int, idAs: String, sAs: String, eAs: String) = ev
      .filter(col("event_type") === tpe)
      .withColumn("dur_min",
        (((unitsWide(col("value"), 100) % mod) + mod) % mod + 1).cast("long"))
      .select(col("event_id").as(idAs), col("ts").as(sAs),
        expr("timestampadd(MINUTE, dur_min, ts)").as(eAs))
      .filter(col(eAs).isNotNull)
    val a = intervals("purchase", 45, "a_id", "a_s", "a_e")
      .withColumn("bkt",
        explode(sequence(date_trunc("hour", col("a_s")),
          date_trunc("hour", col("a_e")), expr("INTERVAL 1 HOUR"))))
    val b = intervals("error", 30, "b_id", "b_s", "b_e")
      .withColumn("b_bkt",
        explode(sequence(date_trunc("hour", col("b_s")),
          date_trunc("hour", col("b_e")), expr("INTERVAL 1 HOUR"))))
    a.join(b,
        col("bkt") === col("b_bkt") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("bkt") === date_trunc("hour", greatest(col("a_s"), col("b_s"))))
      .groupBy(date_trunc("day", col("a_s")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a_id")).as("n_purchases"),
        sum(unix_micros(least(col("a_e"), col("b_e"))) -
          unix_micros(greatest(col("a_s"), col("b_s")))).as("overlap_us"))
      .orderBy("day")
  }

  def all: Seq[Q] = Seq(q05, q06, q07, q08, q09, q10, q11, q12,
    qJoinAsofFwd, qJoinAsofNear, qSubqueryScalar, qSubqueryCorr, qJoinFull,
    qJoinFuzzy, qJoinInterval)
}
