package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.Det._
import graft.sources.Tables

/** Streaming operators (SURVEY.md §2.8). Each windowed aggregation exists
  * twice over the SAME logic: a batch twin (graded against the DuckDB
  * oracle — Q35-Q37) and a Structured Streaming builder (same groupBy,
  * plus watermark) verified by MemoryStream ScalaTests. Keeping one
  * `agg` definition for both guarantees the streaming path computes what
  * the verified batch path computes.
  *
  * Scale notes: windowed streaming aggs keep state per (window, key);
  * the 10-minute watermark bounds that state — expired windows are
  * evicted, so state size is O(active windows × keys), not O(stream).
  * Session windows additionally merge on arrival; the gap bound keeps
  * per-user state to the single open session.
  */
object Streams {

  /** Tumbling-window agg core, shared by Q35 and the streaming twin. */
  private def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), exactSumWide(col("value"), 1000000).as("sum_value"))

  /** Q35 — tumbling 1-hour window per event_type (batch twin). */
  val q35 = Q(
    "q_stream_tumbling",
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  COUNT(*) AS cnt,
       |  ${sqlExactSumWide("value", 1000000)} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  ) { (spark, dir) =>
    tumblingAgg(Tables.events(spark, dir))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Sliding-window agg core (1 h window, 30 min slide): each event lands
    * in exactly 2 windows. */
  private def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))

  /** Q36 — sliding window (batch twin). The oracle expands each event into
    * its two member windows explicitly. */
  val q36 = Q(
    "q_stream_sliding",
    """SELECT window_start, COUNT(*) AS cnt
      |FROM (
      |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
      |    AS window_start
      |  FROM events)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  ) { (spark, dir) =>
    slidingAgg(Tables.events(spark, dir))
      .select(col("w.start").as("window_start"), col("cnt"))
      .orderBy("window_start")
  }

  /** Session-window agg core (10-minute gap) per user. */
  private def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), exactSumWide(col("value"), 1000000).as("sum_value"))

  /** Q37 — session windows (batch twin). Spark's session end = last event
    * + gap, so duration = (end - start) - gap. The oracle is the standard
    * gaps-and-islands rewrite with the same strict >= gap boundary. */
  val q37 = Q(
    "q_stream_session",
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |              OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM marked)
       |SELECT user_id, min(ts) AS session_start,
       |  COUNT(*) AS n_events,
       |  (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS dur_secs,
       |  ${sqlExactSumWide("value", 1000000)} AS sum_value
       |FROM sessions
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin
  ) { (spark, dir) =>
    sessionAgg(Tables.events(spark, dir))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"),
        // subtract the gap in integer µs BEFORE the single float division —
        // (x/1e6 - 600.0) would reintroduce float error vs the oracle's
        // (max-min)/1e6
        ((unix_micros(col("w.end")) - unix_micros(col("w.start")) - lit(600000000L))
          / lit(1000000.0)).as("dur_secs"),
        col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** Stream-stream interval-join core, shared by the graded batch twin and
    * the streaming twin: each purchase joined to the same user's clicks in
    * the preceding 30 minutes (strictly before the purchase). */
  private def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") < col("p_ts"))

  private def purchases(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))

  private def clicks(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))

  /** Stream-stream interval join (batch twin): per purchase, how many of
    * the same user's clicks landed in the preceding 30 minutes. Inner-join
    * semantics (purchases with zero prior clicks don't appear) — exactly
    * what the streaming interval join emits. */
  val qStreamJoin = Q(
    "q_stream_join",
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |  COUNT(*) AS n_clicks
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.user_id = p.user_id
      | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
      |GROUP BY 1, 2, 3
      |ORDER BY p_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    purchaseClickJoin(purchases(ev), clicks(ev))
      .groupBy(col("p_id"), col("p_user").as("user_id"), col("p_ts"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("p_id")
  }

  /** Streaming twin: both sides watermarked, the range condition bounds
    * each side's buffered state to ~30 minutes of events — the state-
    * eviction contract that makes a stream-stream join runnable forever.
    * (Per-purchase aggregation happens downstream/batch; the streaming
    * stage emits the joined pairs.) */
  def purchaseClickJoinStream(purchaseEvents: DataFrame, clickEvents: DataFrame): DataFrame =
    purchaseClickJoin(
      purchases(purchaseEvents).withWatermark("p_ts", "10 minutes"),
      clicks(clickEvents).withWatermark("c_ts", "1 hour"))

  /** LEFT OUTER stream-stream interval join (batch twin): every purchase
    * appears, with its count of same-user clicks in the preceding 30
    * minutes — zero when none. The outer side is what attribution
    * pipelines actually need (unattributed conversions are the signal);
    * in streaming it exercises the distinct append-mode contract that
    * null-padded rows are withheld until BOTH watermarks clear the join
    * range (purchaseClickLeftJoinStream + StreamingSpec). Same plan as
    * the inner twin — one interval join, one purchase-keyed rollup. */
  val qStreamJoinLeft = Q(
    "q_stream_join_left",
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |  CAST(COUNT(c.user_id) AS BIGINT) AS n_clicks
      |FROM events p LEFT JOIN events c
      |  ON c.event_type = 'click'
      | AND c.user_id = p.user_id
      | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY 1, 2, 3
      |ORDER BY p_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    purchases(ev).join(clicks(ev),
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") < col("p_ts"),
      "left_outer")
      .groupBy(col("p_id"), col("p_user").as("user_id"), col("p_ts"))
      .agg(count(col("c_user")).as("n_clicks"))
      .orderBy("p_id")
  }

  /** Streaming half of the left-outer interval join: unmatched purchases
    * are emitted null-padded only after the click-side watermark passes
    * p_ts (the engine can then prove no matching click can still
    * arrive) — the state-correctness semantics StreamingSpec pins. */
  def purchaseClickLeftJoinStream(purchaseEvents: DataFrame, clickEvents: DataFrame): DataFrame =
    purchases(purchaseEvents).withWatermark("p_ts", "10 minutes")
      .join(clicks(clickEvents).withWatermark("c_ts", "1 hour"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "left_outer")

  /** Windowed per-user agg core, shared by the top-k batch twin and the
    * streaming builder. */
  private def userWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), exactSumWide(col("value"), 1000000).as("sum_value"))

  /** Windowed top-k: the 3 highest-value users per hour — the trending/
    * leaderboard query. Batch twin ranks the windowed agg directly; in
    * streaming, the SAME userWindowAgg runs incrementally under a
    * watermark and the tiny per-window rank is a downstream (foreachBatch
    * or batch-over-sink) step — ranking over an updating agg is not
    * emittable mid-window under append semantics. The rank key is the
    * exact-unit sum (identical double on both engines), tiebroken by
    * user_id. */
  val qStreamTopk = Q(
    "q_stream_topk",
    s"""WITH h AS (
       |  SELECT date_trunc('hour', ts) AS ws, user_id,
       |    ${sqlExactSumWide("value", 1000000)} AS sum_value
       |  FROM events GROUP BY 1, 2)
       |SELECT ws AS window_start, rk, user_id, sum_value FROM (
       |  SELECT ws, user_id, sum_value,
       |    CAST(row_number() OVER (PARTITION BY ws
       |      ORDER BY sum_value DESC, user_id) AS INT) AS rk
       |  FROM h)
       |WHERE rk <= 3
       |ORDER BY window_start, rk""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val rw = Window.partitionBy("w").orderBy(desc("sum_value"), asc("user_id"))
    userWindowAgg(Tables.events(spark, dir))
      .withColumn("rk", row_number().over(rw))
      .filter(col("rk") <= 3)
      .select(col("w.start").as("window_start"), col("rk"), col("user_id"),
        col("sum_value"))
      .orderBy("window_start", "rk")
  }

  /** Batch twin of the keyed streaming dedup ([[dedupKeyStream]]):
    * earliest-wins per (user_id, event_type) — the first event of each
    * kind a user ever fired, with ties broken by event_id so the survivor
    * is deterministic cross-engine. The rank-1 window plans a pre-shuffle
    * WindowGroupLimit (one candidate per key per task crosses the wire),
    * and the streaming stage holds one state row per open key under the
    * watermark — both sides are bounded at 100 TB. */
  val qStreamDedup = Q(
    "q_stream_dedup",
    """SELECT user_id, event_type, ts AS first_ts,
      |  event_id AS first_event_id, value AS first_value
      |FROM (
      |  SELECT user_id, event_type, ts, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("ts").as("first_ts"),
        col("event_id").as("first_event_id"), col("value").as("first_value"))
      .orderBy("user_id", "event_type")
  }

  /** Batch twin of the STREAM-STATIC enrichment join ([[enrichStream]]):
    * attach the customer's market segment to each event (user_id is a
    * custkey in the fixtures) and aggregate per (segment, event_type).
    * No broadcast hint: customer grows with the corpus (it is a TPC-H
    * scale-factor table, not a bounded dim), so the strategy is left to
    * AQE — it broadcasts while the pruned (custkey, segment) projection
    * fits and demotes to a shuffle join past the threshold, the same
    * discipline the dedup tables follow. The join holds no state either
    * way (a static side needs no watermark). */
  val qStreamEnrich = Q(
    "q_stream_enrich",
    s"""SELECT c_mktsegment AS segment, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(${graft.functions.Det.sqlUnitsWide("value", 100)}) AS BIGINT) AS value_cents
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY segment, event_type
      |ORDER BY segment, event_type""".stripMargin
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_mktsegment"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.Det.unitsWide(col("value"), 100))
          .cast("long").as("value_cents"))
      .orderBy("segment", "event_type")
  }

  /** Streaming half of [[qStreamEnrich]] minus the aggregate: per-event
    * enrichment against a STATIC dim — stateless, append-mode. As in the
    * batch twin, no broadcast hint: the micro-batch planner picks the
    * strategy per batch from the static side's actual (pruned) size. */
  def enrichStream(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(customers.select("c_custkey", "c_mktsegment"),
      col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment").as("segment"))

  /** Streaming stage of the windowed top-k: the incremental per-(window,
    * user) aggregation under a 10-minute watermark. State is one row per
    * open (window, user) — watermark-bounded. */
  def userWindowStream(events: DataFrame): DataFrame =
    userWindowAgg(events.withWatermark("ts", "10 minutes"))

  // ---- Structured Streaming twins (MemoryStream-tested; not oracle-able) ----

  /** Streaming tumbling agg with a 10-minute watermark: late rows beyond
    * the watermark are dropped; in Append mode a window only emits once
    * the watermark passes its end. */
  def tumblingStream(events: DataFrame): DataFrame =
    tumblingAgg(events.withWatermark("ts", "10 minutes"))

  def slidingStream(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "10 minutes"))

  def sessionStream(events: DataFrame): DataFrame =
    sessionAgg(events.withWatermark("ts", "10 minutes"))

  /** Stateful streaming dedup: exactly-once per event_id within the
    * watermark horizon; state for ids older than the watermark is evicted. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Keyed streaming dedup: exactly-once per (user_id, event_type) within
    * the watermark horizon — the streaming half of q_stream_dedup's batch
    * twin (with an in-event-time-order feed, "first arriving" is the batch
    * twin's earliest-ts row; StreamingSpec asserts the equivalence). */
  def dedupKeyStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  // ---- Arbitrary stateful processing (flatMapGroupsWithState) ------------

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserState(n_events: Long, sum_value: Double)
  final case class UserUpdate(user_id: Long, n_events: Long, sum_value: Double)

  /** Running per-user aggregate via explicit state: emits one update per
    * user per micro-batch. State is one (count, sum) pair per user — the
    * bounded-state shape that survives an unbounded stream. */
  def runningUserState(events: Dataset[Ev]): Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          state.update(UserState(n, s))
          Iterator(UserUpdate(uid, n, s))
      }
  }

  // ---- Arbitrary stateful processing (transformWithState, state v2) ------

  /** The same running per-user aggregate on Spark 4's state-v2 API
    * (`StatefulProcessor` + typed `ValueState`): the operator a NEW
    * streaming pipeline should reach for — per-state-variable typed
    * handles, server-side TTL, and timers, over the RocksDB state store
    * (which state v2 requires; the spec sets the provider conf). Kept
    * alongside [[runningUserState]] deliberately: both APIs stay covered,
    * and StreamingSpec asserts they produce identical per-user totals on
    * the same feed. State per user is one (count, sum) pair — bounded
    * regardless of stream length; TTLConfig.NONE because the batch twin
    * it must match never expires state (swap in a Duration for the
    * production idle-user-eviction case). */
  final class RunningUserProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserUpdate] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserState]("userAgg",
        org.apache.spark.sql.Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[UserUpdate] = {
      val prev = if (st.exists()) st.get() else UserState(0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      rows.foreach { e => n += 1; s += e.value }
      st.update(UserState(n, s))
      Iterator(UserUpdate(key, n, s))
    }
  }

  /** [[runningUserState]] re-expressed on transformWithState. */
  def runningUserStateV2(events: Dataset[Ev]): Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningUserProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  def all: Seq[Q] = Seq(q35, q36, q37, qStreamJoin, qStreamJoinLeft,
    qStreamTopk, qStreamDedup, qStreamEnrich)
}
