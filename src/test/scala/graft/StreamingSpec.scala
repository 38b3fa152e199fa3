package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Structured Streaming behavior that the batch oracle can't grade
  * (SURVEY §2.8): watermark late-data drop, stateful dedup within the
  * watermark, and arbitrary state via flatMapGroupsWithState — all driven
  * through MemoryStream micro-batches. */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
      v: Double = 1.0): Ev = Ev(id, ts(t), user, typ, v)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("file source -> parquet sink incremental run resumes from its checkpoint") {
    // The production batch-incremental shape: a file-backed readStream
    // processed with Trigger.AvailableNow into a parquet sink, then NEW
    // files land and a SECOND run (same checkpointLocation) processes
    // ONLY them — exactly-once offsets across restarts, no reprocessing.
    val spk = spark
    import spk.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_stream_inc")
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    def run(): Unit = {
      val q = spk.readStream
        .schema("event_id LONG, user_id LONG, value DOUBLE")
        .parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // part files land flat in `in` (the streaming file source lists one
    // directory level); append-mode adds the second batch's files
    Seq((1L, 10L, 1.0), (2L, 11L, 2.0)).toDF("event_id", "user_id", "value")
      .coalesce(1).write.mode("append").parquet(in)
    run()
    assert(spk.read.parquet(out).count() === 2)
    Seq((3L, 12L, 3.0)).toDF("event_id", "user_id", "value")
      .coalesce(1).write.mode("append").parquet(in)
    run()
    val rows = spk.read.parquet(out)
    // second run appended only the new file's rows — no duplicates
    assert(rows.count() === 3)
    assert(rows.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("foreachBatch parquet sink is idempotent under micro-batch replay") {
    // foreachBatch is AT-LEAST-ONCE: after a crash the last batch replays
    // with the SAME batch id. The sink owns batch=<id> and overwrites it
    // whole, so a replay rewrites identical contents instead of appending
    // duplicates — asserted by re-running a batch by hand and comparing.
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_febatch_ck").toString
    val input = MemoryStream[Ev]
    val q = graft.sources.Sinks.foreachBatchParquet(input.toDF(), out)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "view", 1.0))
      q.processAllAvailable()
      input.addData(Ev(2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 11L, "click", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val once = spk.read.parquet(out)
    assert(once.count() === 2)
    // batch lineage is a partition column readers can prune on
    assert(once.columns.contains("batch"))
    // crash-replay of batch 1: same id, same rows -> same final contents
    graft.sources.Sinks.writeBatch(
      Seq(Ev(2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 11L, "click", 2.0))
        .toDF(), out, 1L)
    val replayed = spk.read.parquet(out)
    assert(replayed.count() === 2, "replaying a batch id must not append duplicates")
    assert(replayed.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("foreachBatch streaming MERGE keeps one latest row per key across batches") {
    // The streaming-lakehouse upsert: each micro-batch MERGEs into a keyed
    // parquet table (latest-wins within the batch by seq, batch-beats-base
    // across batches) — the streaming twin of q_merge_upsert's single
    // full-outer-join plan. Asserted: cross-batch update, insert,
    // untouched survivor, and replay convergence (re-applying a batch's
    // data yields the identical table — at-least-once safe).
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val input = MemoryStream[(Long, String, Long)]
    val q = input.toDF().toDF("key", "payload", "seq")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.sources.Sinks.upsertBatch(batch.toDF(), table, "key", "seq")
      }
      .option("checkpointLocation", ckpt).start()
    def state(): Map[Long, String] = graft.sources.Sinks.readTable(spk, table)
      .select("key", "payload").as[(Long, String)].collect().toMap
    try {
      // batch 1: two inserts, with an in-batch duplicate key (seq 2 wins)
      input.addData((1L, "a1", 1L), (1L, "a2", 2L), (2L, "b1", 1L))
      q.processAllAvailable()
      assert(state() === Map(1L -> "a2", 2L -> "b1"))
      // batch 2: update key 1, insert key 3, key 2 untouched
      input.addData((1L, "a3", 3L), (3L, "c1", 1L))
      q.processAllAvailable()
      assert(state() === Map(1L -> "a3", 2L -> "b1", 3L -> "c1"))
    } finally q.stop()
    // replay convergence: applying batch 2's rows again changes nothing
    graft.sources.Sinks.upsertBatch(
      Seq((1L, "a3", 3L), (3L, "c1", 1L)).toDF("key", "payload", "seq"),
      table, "key", "seq")
    assert(state() === Map(1L -> "a3", 2L -> "b1", 3L -> "c1"))
    // STALE replay (batch 1's rows, lower seqs) must also change nothing:
    // the stored seq beats the stale batch seq per key, so an arbitrary
    // out-of-order redelivery can't regress a key to an older value
    graft.sources.Sinks.upsertBatch(
      Seq((1L, "a1", 1L), (1L, "a2", 2L), (2L, "b1", 1L))
        .toDF("key", "payload", "seq"),
      table, "key", "seq")
    assert(state() === Map(1L -> "a3", 2L -> "b1", 3L -> "c1"),
      "a replayed stale batch must lose to greater stored seqs")
    // pointer-published layout: CURRENT names the live data dir, and at
    // most HistoryKeep versions (live + retained predecessors) survive
    assert(new java.io.File(table + "/CURRENT").exists(),
      "upsertBatch must publish through the CURRENT pointer")
    assert(new java.io.File(table).listFiles()
      .count(_.getName.startsWith("data-")) <= graft.sources.Sinks.HistoryKeep,
      "publish must retire every version beyond the history window")
    // EQUAL-seq determinism: two different values at the same seq resolve
    // by the row-hash tiebreak (a total order), so applying them in either
    // order — or replaying either afterwards — converges to one winner
    graft.sources.Sinks.upsertBatch(
      Seq((9L, "x", 5L)).toDF("key", "payload", "seq"), table, "key", "seq")
    graft.sources.Sinks.upsertBatch(
      Seq((9L, "y", 5L)).toDF("key", "payload", "seq"), table, "key", "seq")
    val winner = state()(9L)
    graft.sources.Sinks.upsertBatch( // replay the loser: must change nothing
      Seq((9L, if (winner == "x") "y" else "x", 5L))
        .toDF("key", "payload", "seq"), table, "key", "seq")
    assert(state()(9L) === winner,
      "equal-seq rows must resolve deterministically under replay")
  }

  test("merge-on-read streaming MERGE: vectors+appends per batch, zero base rewrites, replay-safe") {
    // The MOR twin of the foreachBatch streaming MERGE above
    // (Sinks.mergeDvStream): every micro-batch retires superseded rows as
    // deletion vectors and appends winners as new files — the SEED
    // version's base files must survive byte-identical across the whole
    // stream, and the visible table must match the COW sink's semantics
    // exactly (update, insert, survivor, fresh replay, stale replay).
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val table = java.nio.file.Files
      .createTempDirectory("graft_mor_stream").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_mor_stream_ck").toString
    // MOR mutates a committed version: seed through the pointer protocol
    graft.sources.Sinks.upsertBatch(
      Seq((1L, "a0", 0L), (2L, "b0", 0L)).toDF("key", "payload", "seq"),
      table, "key", "seq")
    val live = graft.sources.Sinks.resolveTable(spk, table)
    def baseSig(): Map[String, Long] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spk.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(live))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> st.getLen).toMap
    }
    val seedFiles = baseSig()
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.sources.Sinks.mergeDvStream(
        input.toDF().toDF("key", "payload", "seq"), table, "key", "seq")
      .option("checkpointLocation", ckpt).start()
    def state(): Map[Long, String] = graft.sources.Sinks.readTable(spk, table)
      .select("key", "payload").as[(Long, String)].collect().toMap
    try {
      // batch 1: update key 1 (in-batch dup, seq 2 wins), insert key 3
      input.addData((1L, "a1", 1L), (1L, "a2", 2L), (3L, "c1", 1L))
      q.processAllAvailable()
      assert(state() === Map(1L -> "a2", 2L -> "b0", 3L -> "c1"))
      // batch 2: update key 3, key 2 still untouched
      input.addData((3L, "c2", 2L))
      q.processAllAvailable()
      assert(state() === Map(1L -> "a2", 2L -> "b0", 3L -> "c2"))
    } finally q.stop()
    // the seed version's files survived every micro-batch byte-identical
    val after = baseSig()
    assert(seedFiles.forall { case (n, len) => after.get(n).contains(len) },
      "a MOR micro-batch rewrote or removed a seed base file")
    assert(new java.io.File(s"$live/_deletes").exists,
      "superseded rows must be recorded as deletion vectors")
    // fresh replay converges (identical visible rows)
    graft.sources.Sinks.upsertBatchDv(
      Seq((3L, "c2", 2L)).toDF("key", "payload", "seq"), table, "key", "seq")
    assert(state() === Map(1L -> "a2", 2L -> "b0", 3L -> "c2"))
    // stale replay loses per key and is a visible no-op
    graft.sources.Sinks.upsertBatchDv(
      Seq((1L, "a1", 1L), (1L, "a2", 2L), (3L, "c1", 1L))
        .toDF("key", "payload", "seq"), table, "key", "seq")
    assert(state() === Map(1L -> "a2", 2L -> "b0", 3L -> "c2"),
      "a stale replayed MOR batch must lose to greater stored seqs")
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    // Stateless stream-static join: no watermark required, the static
    // side broadcasts per micro-batch, and every event is enriched with
    // its dim attributes — the streaming half of q_stream_enrich.
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val dim = Seq((10L, "BUILDING"), (11L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[Ev]
    val q = graft.streaming.Streams.enrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out").start()
    try {
      input.addData(
        Ev(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "view", 1.0),
        Ev(2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 11L, "click", 2.0),
        Ev(3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 99L, "view", 3.0))
      q.processAllAvailable()
      val rows = spk.sql("SELECT event_id, segment FROM enrich_out")
        .as[(Long, String)].collect().toMap
      // inner join: the unknown user (99) is dropped, the others enrich
      assert(rows === Map(1L -> "BUILDING", 2L -> "MACHINERY"))
    } finally q.stop()
  }

  test("rate source sustains a watermarked windowed agg with bounded state") {
    // MemoryStream grades semantics; this grades the UNBOUNDED path the
    // other tests can't: a rate source generates rows forever, so the
    // query must (a) make continuous multi-batch progress, (b) keep up
    // with the offered rate rather than growing a backlog, and (c) hold
    // only watermark-bounded state — the three properties that decide
    // whether a streaming job survives day 2 in production.
    import org.apache.spark.sql.functions._
    val spk = spark
    val rps = 5000
    val agg = spk.readStream.format("rate")
      .option("rowsPerSecond", rps).option("numPartitions", 2).load()
      .withWatermark("timestamp", "2 seconds")
      .groupBy(window(col("timestamp"), "1 second"),
        (col("value") % 10).as("k"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val q = agg.writeStream.format("memory").queryName("graft_rate_harness")
      .outputMode("update").start()
    withQuery(q) {
      // run until enough non-empty batches have completed for the state
      // size to reach its watermark-bounded plateau (~4 live windows).
      // Deadline-bounded so a wedged query fails the assertions instead
      // of hanging the suite.
      val deadline = System.nanoTime() + 45L * 1000 * 1000 * 1000
      def nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      while (System.nanoTime() < deadline && nonEmpty.length < 8)
        Thread.sleep(250)
      val ps = nonEmpty
      assert(ps.length >= 8, s"only ${ps.length} non-empty batches")
      // keeping up: the source offered ~rps rows/s of wall clock; the
      // query must have absorbed a sustained stretch of it
      val totalRows = ps.map(_.numInputRows).sum
      assert(totalRows >= 2L * rps,
        s"absorbed only $totalRows rows at $rps rows/s offered")
      val bestRate = ps.map(_.processedRowsPerSecond).max
      assert(bestRate >= rps,
        s"peak processed rate $bestRate never reached the offered $rps/s — backlog grows")
      // bounded state: the watermark must hold the live-window plateau
      // (~4 windows x 10 keys with 1 s triggers under a 2 s delay), not
      // accumulate every window ever seen. Without eviction, state grows
      // by ~10 rows per 1 s window forever — the plateau is the proof.
      // (Asserted on numRowsTotal, not numRowsRemoved: update-mode window
      // eviction does not populate the removed counter in this operator.)
      def diag = ps.map { p =>
        val so = p.stateOperators.headOption
        s"in=${p.numInputRows} wm=${Option(p.eventTime.get("watermark")).getOrElse("-")} " +
          s"state=${so.map(_.numRowsTotal).getOrElse(-1L)}"
      }.mkString("\n")
      val stateTotals = ps.flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      assert(stateTotals.last <= 200,
        s"state holds ${stateTotals.last} rows — growing without bound:\n$diag")
      // plateau: the last batches stopped growing (bounded), i.e. the
      // final reading is no higher than a mid-run reading plus one
      // window's worth of keys
      assert(stateTotals.last <= stateTotals(stateTotals.length / 2) + 10,
        s"state still growing at end of run:\n$diag")
    }
  }

  test("tumbling window + watermark drops late data in append mode") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.tumblingStream(input.toDF())
      .selectExpr("w.start AS window_start", "event_type", "cnt")
      .writeStream.format("memory").queryName("tumbling_wm")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      // watermark still behind the window end: nothing emitted yet
      assert(spk.table("tumbling_wm").count() === 0)

      input.addData(ev(3, "2024-01-01 11:30:00"))
      q.processAllAvailable()
      // watermark = 11:20 > [10:00,11:00) end -> that window emits with 2 rows
      val emitted = spk.table("tumbling_wm").as[(Timestamp, String, Long)].collect()
      assert(emitted.toSeq === Seq((ts("2024-01-01 10:00:00"), "click", 2L)))

      // a late event behind the watermark is DROPPED, not merged
      input.addData(ev(4, "2024-01-01 10:05:00"))
      input.addData(ev(5, "2024-01-01 12:45:00")) // advances watermark past 12:00
      q.processAllAvailable()
      val rows = spk.table("tumbling_wm").as[(Timestamp, String, Long)]
        .collect().toSeq.sortBy(_._1.getTime)
      // 10:00 window still cnt=2 (late row 4 dropped); 11:00 window cnt=1
      assert(rows === Seq(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "click", 1L)))
    }
  }

  test("windowed per-user agg stream matches the batch twin it feeds top-k from") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.userWindowStream(input.toDF())
      .selectExpr("w.start AS ws", "user_id", "cnt", "sum_value")
      .writeStream.format("memory").queryName("user_win")
      .outputMode("append").start()
    val data = Seq(
      ev(1, "2024-01-01 10:00:00", user = 1, v = 5.0),
      ev(2, "2024-01-01 10:10:00", user = 2, v = 9.0),
      ev(3, "2024-01-01 10:20:00", user = 1, v = 2.5))
    withQuery(q) {
      input.addData(data: _*)
      input.addData(ev(9, "2024-01-01 12:00:00", user = 9)) // advance watermark
      q.processAllAvailable()
      val streamed = spk.table("user_win")
        .filter("ws = timestamp'2024-01-01 10:00:00'")
        .as[(Timestamp, Long, Long, Double)].collect().toSeq.sortBy(_._2)
      // identical numbers to running the shared agg core in batch
      assert(streamed === Seq(
        (ts("2024-01-01 10:00:00"), 1L, 2L, 7.5),
        (ts("2024-01-01 10:00:00"), 2L, 1L, 9.0)))
    }
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.dedupStream(input.toDF())
      .selectExpr("event_id")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:02:00")) // same id, within watermark
      q.processAllAvailable()
      val ids = spk.table("dedup_wm").as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L), "each event_id must appear exactly once")
    }
  }

  test("keyed streaming dedup matches the q_stream_dedup batch twin") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    // in-event-time-order feed: first-arriving == earliest-ts, which is
    // exactly the batch twin's rank-1 survivor rule
    val rows = Seq(
      ev(10, "2024-01-01 10:00:00", user = 1, typ = "click", v = 1.0),
      ev(11, "2024-01-01 10:00:30", user = 1, typ = "click", v = 2.0), // dup key
      ev(12, "2024-01-01 10:01:00", user = 1, typ = "view", v = 3.0),
      ev(13, "2024-01-01 10:02:00", user = 2, typ = "click", v = 4.0),
      ev(14, "2024-01-01 10:03:00", user = 2, typ = "click", v = 5.0), // dup key
      ev(15, "2024-01-01 10:04:00", user = 1, typ = "click", v = 6.0)) // dup key
    val input = MemoryStream[Ev]
    val q = Streams.dedupKeyStream(input.toDF())
      .selectExpr("user_id", "event_type", "event_id")
      .writeStream.format("memory").queryName("dedup_key_wm")
      .outputMode("append").start()
    withQuery(q) {
      rows.foreach { r => input.addData(r); q.processAllAvailable() }
      val streamed = spk.table("dedup_key_wm").as[(Long, String, Long)]
        .collect().toSet
      // batch twin semantics on the same rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val batch = rows.toDF()
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(org.apache.spark.sql.functions.col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .as[(Long, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set((1L, "click", 10L), (1L, "view", 12L),
        (2L, "click", 13L)))
    }
  }

  test("session windows merge within the gap and emit after watermark passes") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.sessionStream(input.toDF())
      .selectExpr("w.start AS session_start", "user_id", "n_events")
      .writeStream.format("memory").queryName("session_wm")
      .outputMode("append").start()
    withQuery(q) {
      // 10:00 and 10:05 merge (gap < 10 min); 10:30 starts a new session
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"),
        ev(3, "2024-01-01 10:30:00"))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 11:30:00")) // watermark past both ends
      q.processAllAvailable()
      val sessions = spk.table("session_wm").as[(Timestamp, Long, Long)]
        .collect().toSeq.sortBy(_._1.getTime)
      assert(sessions === Seq(
        (ts("2024-01-01 10:00:00"), 1L, 2L),
        (ts("2024-01-01 10:30:00"), 1L, 1L)))
    }
  }

  test("sliding windows place each event in two windows (streaming)") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.slidingStream(input.toDF())
      .selectExpr("w.start AS window_start", "cnt")
      .writeStream.format("memory").queryName("sliding_wm")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:40:00"))
      input.addData(ev(2, "2024-01-01 13:00:00")) // flush via watermark
      q.processAllAvailable()
      val wins = spk.table("sliding_wm").as[(Timestamp, Long)]
        .collect().toSeq.sortBy(_._1.getTime)
      // event at 10:40 belongs to [10:00,11:00) and [10:30,11:30)
      assert(wins === Seq(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:30:00"), 1L)))
    }
  }

  test("stream-stream interval join pairs purchases with prior clicks only") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = Streams.purchaseClickJoinStream(purchases.toDF(), clicks.toDF())
      .selectExpr("p_id", "c_ts")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    withQuery(q) {
      clicks.addData(
        ev(11, "2024-01-01 09:40:00", typ = "click"), // within 30 min of p1
        ev(12, "2024-01-01 09:20:00", typ = "click"), // outside the 30-min range
        ev(13, "2024-01-01 10:05:00", typ = "click"), // AFTER p1: must not join
        ev(14, "2024-01-01 09:50:00", user = 2, typ = "click")) // other user
      purchases.addData(ev(1, "2024-01-01 10:00:00", typ = "purchase", v = 9.99))
      q.processAllAvailable()
      // advance both watermarks so the joined pair is emitted in append mode
      clicks.addData(ev(15, "2024-01-01 12:00:00", typ = "click"))
      purchases.addData(ev(2, "2024-01-01 12:00:00", typ = "purchase"))
      q.processAllAvailable()
      val joined = spk.table("ss_join").as[(Long, Timestamp)].collect().toSeq
      assert(joined === Seq((1L, ts("2024-01-01 09:40:00"))),
        "only the same-user click strictly inside (p_ts-30min, p_ts) joins")
    }
  }

  test("left-outer stream-stream join emits null-padded rows after watermark") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = Streams.purchaseClickLeftJoinStream(purchases.toDF(), clicks.toDF())
      .selectExpr("p_id", "c_ts")
      .writeStream.format("memory").queryName("ss_join_left")
      .outputMode("append").start()
    withQuery(q) {
      clicks.addData(
        ev(11, "2024-01-01 09:40:00", typ = "click")) // matches p1 only
      purchases.addData(
        ev(1, "2024-01-01 10:00:00", typ = "purchase", v = 9.99),
        ev(2, "2024-01-01 10:00:00", user = 2, typ = "purchase")) // no clicks
      q.processAllAvailable()
      // matched row may emit immediately; the UNMATCHED purchase must be
      // withheld until the click watermark proves no match can arrive
      val early = spk.table("ss_join_left").as[(Long, Option[Timestamp])]
        .collect().toSeq
      assert(!early.contains((2L, None)),
        "null-padded row must not emit before the watermark passes")
      clicks.addData(ev(15, "2024-01-01 12:00:00", typ = "click"))
      purchases.addData(ev(3, "2024-01-01 12:00:00", typ = "purchase"))
      q.processAllAvailable()
      val joined = spk.table("ss_join_left").as[(Long, Option[Timestamp])]
        .collect().toSeq.sortBy(_._1)
      assert(joined.contains((1L, Some(ts("2024-01-01 09:40:00")))),
        "matched purchase joins its in-range click")
      assert(joined.contains((2L, None)),
        "unmatched purchase emits null-padded once the watermark clears it")
    }
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val input = MemoryStream[Ev]
    val q = Streams.runningUserState(input.toDS())
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00", user = 1, v = 1.5),
        ev(2, "2024-01-01 10:01:00", user = 1, v = 2.5),
        ev(3, "2024-01-01 10:02:00", user = 2, v = 5.0))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 10:03:00", user = 1, v = 4.0))
      q.processAllAvailable()
      val latest = spk.table("user_state")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(latest(1L) === ((1L, 3L, 8.0))) // 3 events, 1.5+2.5+4.0
      assert(latest(2L) === ((2L, 1L, 5.0)))
    }
  }

  test("transformWithState (state v2) matches the v1 per-user totals") {
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    // state v2 runs only on the RocksDB state store; scope the provider
    // conf to this test (new queries read it at start)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spk.conf.getOption(key)
    spk.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Streams.Ev]
      val q = Streams.runningUserStateV2(input.toDS())
        .writeStream.format("memory").queryName("user_state_v2")
        .outputMode("update").start()
      withQuery(q) {
        input.addData(ev(1, "2024-01-01 10:00:00", user = 1, v = 1.5),
          ev(2, "2024-01-01 10:01:00", user = 1, v = 2.5),
          ev(3, "2024-01-01 10:02:00", user = 2, v = 5.0))
        q.processAllAvailable()
        input.addData(ev(4, "2024-01-01 10:03:00", user = 1, v = 4.0))
        q.processAllAvailable()
        val latest = spk.table("user_state_v2")
          .as[(Long, Long, Double)].collect()
          .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
        // identical totals to the flatMapGroupsWithState (v1) test above
        assert(latest(1L) === ((1L, 3L, 8.0)))
        assert(latest(2L) === ((2L, 1L, 5.0)))
      }
    } finally {
      prev match {
        case Some(v) => spk.conf.set(key, v)
        case None => spk.conf.unset(key)
      }
    }
  }

  test("streaming ingest dedup: probe -> admit loop rejects near-dups across batches") {
    // The streaming corpus-building loop (DedupIndex.ingestStream): each
    // micro-batch probes the persisted MinHash index, rejects docs that
    // near-dup the corpus OR a smaller-id doc in the same batch
    // (keep-first), writes survivors to batch=<id>, and admits them into
    // the index — so the dedup state IS the disk artifact, not streaming
    // memory state. Asserted: cross-batch rejection against an ADMITTED
    // doc (the append is live), in-batch keep-first, and at-least-once
    // replay idempotence of a completed cycle.
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val common = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"uniq$i").mkString(" ")
    val third = (1 to 40).map(i => s"pair$i").mkString(" ")
    val solo = (1 to 40).map(i => s"solo$i").mkString(" ")
    val name = "graft_streamspec_ingest_idx"
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ck").toString
    graft.operators.DedupIndex.write(
      Seq((3L, s"$common alpha", "en")).toDF("doc_id", "text", "lang"), name)
    def admitted(): Set[Long] = spk.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, String, String)]
    val q = graft.operators.DedupIndex.ingestStream(
      input.toDF().toDF("doc_id", "text", "lang"), name, out, ckpt)
    val batch1 = Seq((20L, s"$other gamma", "en"),
      (21L, s"$third epsilon", "en"), (22L, s"$third zeta", "en"),
      (23L, s"$solo eta", "en"))
    withQuery(q) {
      // batch 0: doc 10 fresh -> admitted; doc 11 near-dups corpus doc 3
      input.addData((10L, s"$other beta", "en"), (11L, s"$common delta", "en"))
      q.processAllAvailable()
      assert(admitted() === Set(10L), "batch 0: corpus near-dup must be rejected")
      // batch 1: doc 20 near-dups doc 10 ADMITTED LAST BATCH (the append
      // is live); docs 21/22 near-dup each other in-batch (keep-first
      // admits 21); doc 23 is fresh
      batch1.foreach(r => input.addData(r))
      q.processAllAvailable()
      assert(admitted() === Set(10L, 21L, 23L),
        "batch 1: cross-batch + in-batch near-dups must be rejected")
    }
    // at-least-once replay of the COMPLETED batch-1 cycle: already-indexed
    // docs re-emit as admitted (no self-match rejection), nothing appends
    graft.operators.DedupIndex.ingestBatch(
      batch1.toDF("doc_id", "text", "lang"), name, out, 1L)
    assert(admitted() === Set(10L, 21L, 23L),
      "replaying a completed cycle must rewrite identical output")
    val tokenDocs = spk.table(s"${name}_tokens")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(tokenDocs === Set(3L, 10L, 21L, 23L),
      s"index must hold exactly the admitted corpus, got $tokenDocs")
    spk.sql(s"DROP TABLE IF EXISTS ${name}_bands")
    spk.sql(s"DROP TABLE IF EXISTS ${name}_tokens")
  }

  test("streaming embedding ingest: ANN probe -> admit loop rejects vector near-dups") {
    // The ANN twin of the ingest-dedup loop (VecIndex.ingestStream): each
    // micro-batch probes the persisted LSH index, rejects vectors whose
    // nearest indexed neighbor reaches the dup threshold OR that match a
    // smaller-id vector in the same batch, writes survivors to
    // batch=<id>, and admits them. One-hot unit vectors pin the cosines
    // exactly (1 for an identical direction, 0 otherwise).
    val spk = spark
    import spk.implicits._
    implicit val ctx = spk.sqlContext
    val dim = 64
    def e(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    val name = "graft_streamspec_vecingest_idx"
    val out = java.nio.file.Files.createTempDirectory("graft_vingest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vingest_ck").toString
    graft.operators.VecIndex.write(
      Seq((3L, e(0))).toDF("vec_id", "embedding"), name)
    def admitted(): Set[Long] = spk.read.parquet(out)
      .select("vec_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.VecIndex.ingestStream(
      input.toDF().toDF("vec_id", "embedding"), name, out, ckpt)
    val batch1 = Seq((20L, e(1)), (21L, e(2)), (22L, e(2)), (23L, e(3)))
    withQuery(q) {
      // batch 0: vec 10 fresh; vec 11 duplicates corpus direction e0
      input.addData((10L, e(1)), (11L, e(0)))
      q.processAllAvailable()
      assert(admitted() === Set(10L), "batch 0: corpus vector dup must be rejected")
      // batch 1: 20 duplicates ADMITTED 10 (the append is live); 21/22
      // duplicate each other in-batch (keep-first admits 21); 23 fresh
      batch1.foreach(r => input.addData(r))
      q.processAllAvailable()
      assert(admitted() === Set(10L, 21L, 23L),
        "batch 1: cross-batch + in-batch vector dups must be rejected")
    }
    // at-least-once replay of the completed cycle: prior vectors re-emit,
    // nothing appends twice
    graft.operators.VecIndex.ingestBatch(
      batch1.toDF("vec_id", "embedding"), name, out, 1L)
    assert(admitted() === Set(10L, 21L, 23L),
      "replaying a completed cycle must rewrite identical output")
    val ids = spk.table(s"${name}_emb")
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(ids === Set(3L, 10L, 21L, 23L),
      s"index must hold exactly the admitted vectors, got $ids")
    assert(spk.table(s"${name}_emb").count() === 4,
      "payload table must hold one row per admitted vector")
    spk.sql(s"DROP TABLE IF EXISTS ${name}_sig")
    spk.sql(s"DROP TABLE IF EXISTS ${name}_emb")
  }
  test("streaming quality filter matches the batch filter's keep decisions") {
    // Serving pattern for the trained classifier: the weight table and
    // the per-language cuts are ARTIFACTS of offline training; the
    // stream applies them statelessly per micro-batch (broadcast weight
    // join, no state store). Every keep decision must match the batch
    // row's integer-exact rule (m*n > sum m) — batch/stream parity of
    // the curation filter, the property that lets one filter run in
    // both the backfill and the live ingest path.
    val spk = spark
    import spk.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = spk.sqlContext
    val dir = sf()
    val (_, _, m3, w) = graft.operators.Curation.clfTrain(spk, dir)
    val cuts = m3.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("m").cast("bigint").as("s"))
      .persist()
    val expected = m3.join(cuts, "lang")
      .filter(col("m") * col("n") > col("s"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wDf = w.toSeq.toDF("b", "w").persist()
    val docs = graft.sources.Tables.documents(spk, dir)
      .select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val kept = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "lang")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val scored = batch
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("t"))
          .withColumn("b",
            expr(s"(${graft.functions.PortableHash.spark("t")}) % 1024"))
          .join(broadcast(wDf), "b")
          .groupBy("doc_id", "lang")
          .agg(sum("w").cast("bigint").as("m"))
          .join(broadcast(cuts), "lang")
          .filter(col("m") * col("n") > col("s"))
          .select("doc_id").collect().foreach(r => kept.add(r.getLong(0)))
        ()
      }
      .start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { g =>
        input.addData(g.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamed = kept.asScala.toSet
    assert(streamed === expected,
      s"stream/batch keep divergence: stream-only=${streamed.diff(expected)} " +
        s"batch-only=${expected.diff(streamed)}")
    assert(expected.nonEmpty, "parity test needs a nonempty kept set")
    cuts.unpersist(); wDf.unpersist()
    graft.sources.Scratch.releaseAll()
  }
}
