package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables

/** Window-function operators (SURVEY.md §2.5): ranking top-k, analytic
  * lag/lead/rank/ntile, frame-spec running/moving aggregates.
  *
  * Scale notes: a window over PARTITION BY k is one shuffle on k plus a
  * per-partition sort — the same cost shape as a groupBy on k. The top-k
  * pattern (row_number ≤ k) filters immediately after the rank so nothing
  * but the k survivors flows downstream. Every ORDER BY inside a window
  * spec carries a unique-key tiebreak (SURVEY §2.10) so rank assignment is
  * total and cross-engine deterministic.
  */
object Windows {

  /** Q19 — per-group top-k by ranking window: top-3 orders per customer. */
  val q19 = Q(
    "q_win_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Q20 — analytic functions: lag/lead deltas, dense_rank, ntile over the
    * per-user event timeline. value ties in dense_rank collapse to the same
    * rank (deterministic); row identity is pinned by (ts, event_id). */
  val q20 = Q(
    "q_win_analytic",
    """SELECT event_id, user_id, value,
      |  value - lag(value) OVER w AS delta_value,
      |  (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 AS secs_since_prev,
      |  lead(event_type) OVER w AS next_type,
      |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value) AS INT) AS value_rank,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wv = Window.partitionBy("user_id").orderBy("value")
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_value"),
        ((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          / lit(1000000.0)).as("secs_since_prev"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        dense_rank().over(wv).as("value_rank"),
        ntile(4).over(w).as("quartile"))
      .orderBy("event_id")
  }

  /** Q21 — frame-spec windows over a per-day pre-aggregate: 7-row moving
    * average and running total of daily revenue. All ingredients are exact
    * integer cents (Det discipline): the moving sum/count are exact, and
    * the single final division is IEEE-identical on both engines — no
    * rounding needed. */
  val q21 = Q(
    "q_win_frame",
    """SELECT day, rev,
      |  mov_cents / 100.0 / mov_n AS moving_avg_7d,
      |  run_cents / 100.0 AS running_total
      |FROM (
      |  SELECT day, rev,
      |    CAST(SUM(rev_cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_cents,
      |    CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_n,
      |    CAST(SUM(rev_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
      |  FROM (
      |    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
      |      SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS rev
      |    FROM orders GROUP BY 1))
      |ORDER BY day""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Det._
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(
        sum(units(col("o_totalprice"), 100)).cast("long").as("rev_cents"),
        exactSum(col("o_totalprice"), 100).as("rev"))
    val w7 = Window.orderBy("day").rowsBetween(-6, 0)
    val wRun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select(col("day"), col("rev"),
        sum(col("rev_cents")).over(w7).as("mov_cents"),
        count(lit(1)).over(w7).as("mov_n"),
        sum(col("rev_cents")).over(wRun).as("run_cents"))
      .select(col("day"), col("rev"),
        (col("mov_cents") / lit(100.0) / col("mov_n")).as("moving_avg_7d"),
        (col("run_cents") / lit(100.0)).as("running_total"))
      .orderBy("day")
  }

  /** Distribution windows: percent_rank / cume_dist / first_value per
    * mktsegment. The window order (acctbal, custkey) is a unique key, so
    * the rank-derived rationals are exact and identical cross-engine;
    * round6 only pins their decimal repr. */
  val qWinDist = Q(
    "q_win_dist",
    """SELECT c_custkey, c_mktsegment,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  first_value(c_custkey) OVER w AS poorest_k
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first("c_custkey").over(w).as("poorest_k"))
      .orderBy("c_custkey")
  }


  /** RANGE-frame window (vs q_win_frame's ROWS): 3-day trailing revenue
    * per day, where the frame is defined by VALUE distance on the epoch
    * day number — days missing from the data simply contribute nothing,
    * which a ROWS frame cannot express. Both engines frame over the same
    * integer day index, so boundary inclusion is identical. */
  val qWinRangeFrame = Q(
    "q_win_range_frame",
    """SELECT day, trail_cents / 100.0 AS trailing_3d, CAST(trail_n AS BIGINT) AS n_days
      |FROM (
      |  SELECT day,
      |    CAST(SUM(rev_cents) OVER (ORDER BY epoch_day
      |      RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_cents,
      |    COUNT(*) OVER (ORDER BY epoch_day
      |      RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS trail_n
      |  FROM (
      |    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |      CAST(datediff('day', DATE '1970-01-01', CAST(date_trunc('day', o_orderdate) AS DATE)) AS BIGINT) AS epoch_day,
      |      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |    FROM orders GROUP BY 1, 2))
      |ORDER BY day""".stripMargin
  ) { (spark, dir) =>
    import graft.functions.Det._
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(sum(units(col("o_totalprice"), 100)).cast("long").as("rev_cents"))
      .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.orderBy("epoch_day").rangeBetween(-3, 0)
    daily
      .select(col("day"),
        (sum(col("rev_cents")).over(w) / lit(100.0)).as("trailing_3d"),
        count(lit(1)).over(w).as("n_days"))
      .orderBy("day")
  }

  def all: Seq[Q] = Seq(q19, q20, q21, qWinDist, qWinRangeFrame)
}
