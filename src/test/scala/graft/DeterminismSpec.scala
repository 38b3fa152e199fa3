package graft

/** Partition-count independence: the Det discipline (exact integer units,
  * rounded floats, total ORDER BY) promises every graded query returns
  * IDENTICAL rows regardless of the cluster layout. The DuckDB oracle
  * can't see this — it compares one Spark run against one DuckDB run — so
  * this suite re-runs the float-heaviest queries under different
  * spark.sql.shuffle.partitions and asserts row-for-row equality. A
  * failure here means a result would differ between local[4] and a
  * 1000-executor cluster. */
class DeterminismSpec extends SparkTestBase {

  // The queries where partial-aggregation order could plausibly leak into
  // the output: float sums, window ratios, sketch pipelines, iterative CC.
  private val sensitive = Seq(
    "q_agg_pricing", "q_agg_stats", "q_win_share", "q_vec_centroid",
    "q_text_ngram_lm", "q_stream_session", "q_dedup_minhash", "q_dedup_cc",
    "q_udaf_geomean", "q_text_entropy", "q_vec_kmeans", "q_doc_mix_budget",
    "q_clip_outliers", "q_events_twap", "q_events_anomaly",
    "q_vec_recall_eval", "q_win_range_frame",
    // round-9: money ratios, weighted-priority ranking, LSH recall ratio
    "q_olap_mkt_share", "q_sample_weighted", "q_dedup_recall",
    "q_graph_pagerank",
    // round-10 continuation: island-merge windows, integer Gramian,
    // driver-side power iteration over the collected matrix
    "q_doc_dup_mass", "q_vec_covariance", "q_vec_pca_power")

  test("float-sensitive queries return identical rows under 3 vs 17 shuffle partitions") {
    val dir = sf()
    val queries = SparkEntry.queries
    sensitive.foreach { name =>
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try queries(name)(spark, dir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", 4)
      }
      val a = run(3)
      val b = run(17)
      assert(a === b, s"$name differs between 3 and 17 shuffle partitions")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }

  // CANONICAL TIMESTAMP SEMANTICS (SURVEY §1.4, decided round 11): the
  // engine normalizes `events.ts` to TimestampType under a UTC-pinned
  // session, rather than keeping the fixture's TIMESTAMP_NTZ. This test
  // pins the fact that makes the choice safe: under UTC, every time
  // operator the events queries use (date_trunc, tumbling/sliding window,
  // session_window) COMMUTES with the NTZ→TIMESTAMP cast — computing on
  // NTZ then casting equals casting then computing. If Spark's cast or
  // window semantics ever changed (or a non-UTC session leaked in), the
  // streaming twins would drift from the DuckDB oracle; this fails first.
  test("NTZ→TIMESTAMP cast commutes with date_trunc/window/session_window under UTC") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    assume(raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType,
      "fixture is not NTZ-encoded; the commute property is moot")
    val ntz = raw.select(col("event_id"), col("user_id"), col("ts"))

    val castFirst = ntz.select(
      col("event_id"),
      date_trunc("hour", col("ts").cast("timestamp")).as("h"),
      window(col("ts").cast("timestamp"), "10 minutes")("start").as("w"))
    val castAfter = ntz.select(
      col("event_id"),
      date_trunc("hour", col("ts")).cast("timestamp").as("h"),
      window(col("ts"), "10 minutes")("start").cast("timestamp").as("w"))
    assert(castFirst.orderBy("event_id").collect().toSeq ===
      castAfter.orderBy("event_id").collect().toSeq)

    def sessions(df: org.apache.spark.sql.DataFrame, cast: Boolean) = {
      val t = if (cast) col("ts").cast("timestamp") else col("ts")
      df.groupBy(col("user_id"), session_window(t, "5 minutes").as("sw"))
        .count()
        .select(col("user_id"), col("sw.start").cast("timestamp").as("s"),
          col("sw.end").cast("timestamp").as("e"), col("count"))
        .orderBy("user_id", "s").collect().toSeq
    }
    assert(sessions(ntz, cast = true) === sessions(ntz, cast = false))
  }
}
