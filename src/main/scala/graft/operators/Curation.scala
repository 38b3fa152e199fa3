package graft.operators

import graft.sources.Scratch.PersistSyntax
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Data-curation operators a large training pipeline runs between ingest
  * and training: reproducible sampling, funnel/sequence analysis over the
  * event stream, and PII-style redaction over documents.
  *
  * Scale notes: the sample filter is a pure per-row expression (no shuffle
  * at all — it composes with any downstream op and at 100 TB cuts the scan
  * output before the first exchange); the funnel is three user_id-keyed
  * aggregations joined on the same key (one shuffle partitioning reused);
  * redaction is per-row regexp work that whole-stage-codegens.
  */
object Curation {

  /** Deterministic 5% hash-sample of lineitem (hash(key) % 20 = 0), then
    * per-flag stats. Reproducible across runs/engines (unlike TABLESAMPLE,
    * whose RNG is engine-private), stratum-unbiased, and embarrassingly
    * parallel: the filter is a per-row expression evaluated at the scan —
    * the 100 TB shape for carving a training subset. Quantities are summed
    * as exact cent-integers (Det discipline): order-independent. */
  val qSampleHash = Q(
    "q_sample_hash",
    s"""SELECT l_returnflag, count(*) AS n_sampled,
       |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
       |FROM lineitem
       |WHERE ${graft.functions.PortableHash.duck("concat_ws('-', l_orderkey, l_linenumber)")} % 20 = 0
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  ) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(expr(
        s"${graft.functions.PortableHash.spark("concat_ws('-', l_orderkey, l_linenumber)")} % 20 = 0"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sampled"),
        sum(round(col("l_quantity") * 100).cast("bigint")).as("sum_qty_c"))
      .orderBy("l_returnflag")
  }

  /** Weighted sampling without replacement, per language stratum —
    * Sequential Poisson Sampling (Ohlsson): priority ξ = u / w with u a
    * deterministic per-doc uniform and w = n_chars, keep the k smallest ξ
    * per stratum, so longer documents are proportionally more likely.
    * u derives from the portable md5 hash ((h + 0.5) / 2^32), NOT engine
    * RNG: the sample is bit-reproducible across engines, runs, AND task
    * retries — the lineage property a training-data pipeline needs from
    * its sampler. ξ is one exact IEEE division of exact inputs, so the
    * cross-engine ranking cannot flip; doc_id breaks (impossible-in-
    * practice) ties. Plan shape: one scan + per-stratum top-k, which
    * plans a pre-shuffle WindowGroupLimit — each task keeps k rows per
    * stratum before the exchange, never the corpus. */
  val qSampleWeighted = Q(
    "q_sample_weighted",
    s"""WITH s AS (
       |  SELECT lang, doc_id, n_chars,
       |    (${graft.functions.PortableHash.duck("CAST(doc_id AS VARCHAR)")} + 0.5)
       |      / 4294967296.0 / greatest(n_chars, 1) AS xi
       |  FROM documents)
       |SELECT lang, CAST(rk AS INT) AS rk, doc_id, n_chars
       |FROM (SELECT lang, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY lang ORDER BY xi, doc_id) AS rk
       |      FROM s)
       |WHERE rk <= 5
       |ORDER BY lang, rk""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // greatest(w, 1): an empty doc (n_chars = 0) stays sampleable at unit
    // weight instead of dividing by zero — one poison row would otherwise
    // kill the job under ANSI mode (RobustnessSpec).
    val xi = (expr(graft.functions.PortableHash.spark("cast(doc_id as string)"))
      + lit(0.5)) / lit(4294967296.0) / greatest(col("n_chars"), lit(1L))
    val w = Window.partitionBy("lang").orderBy(col("xi"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"), xi.as("xi"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 5)
      .select("lang", "rk", "doc_id", "n_chars")
      .orderBy("lang", "rk")
  }

  /** DSIR data selection (Xie et al., "Data Selection for Language Models
    * via Importance Resampling", NeurIPS 2023): score every document by
    * how much more likely its hashed-n-gram bag is under a TARGET domain
    * than under the raw corpus, then keep the top quarter per language.
    * Features are unigrams hashed into 1024 buckets with the portable md5
    * hash; bucket distributions use add-1 smoothing; the per-bucket
    * log-ratio is fixed to exact millionth units (the bigramNll
    * discipline) so per-doc scores sum order-independently and rank
    * identically cross-engine (doc_id breaks exact-score ties). Target
    * here is the `src0` slice — the "trusted exemplar set" a real run
    * would point at curated text.
    *
    * Scale: the bucket vocabulary is FIXED (1024 rows), so both
    * distribution tables collapse via map-side partial aggregation and
    * the scoring join is an explicit broadcast — the corpus-sized token
    * frame never shuffles to be scored. The only corpus-keyed exchange is
    * the per-doc sum (groupBy doc_id). The exact per-stratum top-25% cut
    * is found by THRESHOLD REFINEMENT, not a rank window: a per-language
    * rank over the scored frame sorts each stratum in a single task
    * (exactly what dies first at 100 TB), so instead a driver loop
    * histograms the integer scores into 4096 per-language buckets per
    * pass and narrows the k-th-largest bracket until it is one unit wide
    * — O(log_4096 range) ≈ 3-4 cheap aggregate passes over the persisted
    * (lang, lw) frame, every one map-side combinable. The selected-set
    * aggregates then need only counts and sums around the cut (ties all
    * carry the SAME score, so which tied doc_ids are kept cannot change
    * any output number) — the per-doc selection itself is a plain filter
    * a real pipeline applies streaming. ScaleSpec locks the no-window
    * shape; the oracle keeps the declarative rank form, so the refinement
    * must reproduce it bit-for-bit (it does, at all three SFs). */
  val qDsir = Q(
    "q_dsir",
    s"""WITH toks AS (
       |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |hb AS (SELECT doc_id, lang, source,
       |    ${graft.functions.PortableHash.duck("t")} % 1024 AS b
       |  FROM toks),
       |raw AS (SELECT b, COUNT(*) AS cq FROM hb GROUP BY b),
       |tgt AS (SELECT b, COUNT(*) AS cp FROM hb WHERE source = 'src0' GROUP BY b),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq,
       |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS np
       |  FROM hb),
       |u AS (SELECT r.b,
       |    CAST(round(ln(((COALESCE(t.cp, 0) + 1.0) / (tot.np + 1024.0))
       |        / ((r.cq + 1.0) / (tot.nq + 1024.0))) * 1000000) AS BIGINT) AS units
       |  FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot),
       |d AS (SELECT hb.doc_id, hb.lang, CAST(SUM(u.units) AS BIGINT) AS lw
       |  FROM hb JOIN u ON hb.b = u.b GROUP BY hb.doc_id, hb.lang),
       |r2 AS (SELECT lang, doc_id, lw,
       |    row_number() OVER (PARTITION BY lang ORDER BY lw DESC, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM d)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rk * 4 <= n + 3 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_selected,
       |  round(CAST(SUM(lw) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS mean_logw,
       |  round(CAST(SUM(CASE WHEN rk * 4 <= n + 3 THEN lw ELSE 0 END) AS BIGINT)
       |      / 1000000.0
       |      / SUM(CASE WHEN rk * 4 <= n + 3 THEN 1 ELSE 0 END), 6)
       |    AS mean_logw_sel
       |FROM r2 GROUP BY lang ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .withColumn("b",
        expr(s"(${graft.functions.PortableHash.spark("t")}) % 1024"))
      .drop("t")
      // feeds both distribution counts, the totals, and the scoring join
      .persistScratch()
    val raw = toks.groupBy("b").agg(count(lit(1)).as("cq"))
    val tgt = toks.filter(col("source") === "src0")
      .groupBy("b").agg(count(lit(1)).as("cp"))
    val tot = toks.agg(count(lit(1)).cast("bigint").as("nq"),
      sum(when(col("source") === "src0", 1L).otherwise(0L))
        .cast("bigint").as("np"))
    // ≤1024 rows after the fixed-vocabulary collapse: broadcast, so the
    // corpus-sized token frame is scored without moving
    val u = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(((coalesce(col("cp"), lit(0L)) + lit(1.0))
            / (col("np") + lit(1024.0)))
          / ((col("cq") + lit(1.0)) / (col("nq") + lit(1024.0)))) * 1000000)
          .cast("bigint").as("units"))
    val d = toks.join(broadcast(u), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("units")).cast("bigint").as("lw"))
      // narrow (lang, lw) frame read by the stats pass, each histogram
      // refinement pass, and the final around-the-cut aggregate
      .persistScratch()
    // k-th-largest-score cut per language by histogram refinement — the
    // oracle's rank window replayed without ever sorting a stratum.
    // Driver state is one row per LANGUAGE (bounded by the stratum key
    // cardinality, never the corpus); each pass is one map-side-
    // combinable aggregate over the persisted score frame.
    final case class St(n: Long, s: Long, var lo: Long, var hi: Long,
      var above: Long)
    val st = scala.collection.mutable.LinkedHashMap(
      d.groupBy("lang").agg(count(lit(1)).as("n"), sum("lw").as("s"),
          min("lw").as("mn"), max("lw").as("mx"))
        .collect()
        .map(r => r.getString(0) ->
          St(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), 0L))
        .toIndexedSeq: _*)
    def kOf(v: St): Long = (v.n + 3) / 4 // rk*4 <= n+3  <=>  rk <= this
    val B = 4096L
    val spk = spark
    import spk.implicits._
    while (st.values.exists(v => v.lo < v.hi)) {
      val open = st.toSeq.filter { case (_, v) => v.lo < v.hi }
      val grid = open.map { case (l, v) =>
        (l, v.lo, v.hi, (v.hi - v.lo) / B + 1)
      }.toDF("lang", "glo", "ghi", "gw")
      val hist = d.join(broadcast(grid), Seq("lang"))
        .filter(col("lw") >= col("glo") && col("lw") <= col("ghi"))
        .groupBy(col("lang"), expr("(lw - glo) div gw").as("gb"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
      open.foreach { case (l, v) =>
        val w = (v.hi - v.lo) / B + 1
        val counts = hist.getOrElse(l, Array.empty)
          .map(r => r.getLong(1) -> r.getLong(2)).toMap
        var cum = v.above // invariant: docs with lw > current hi
        var b = (v.hi - v.lo) / w
        var found = false
        while (!found && b >= 0) {
          val c = counts.getOrElse(b, 0L)
          if (cum + c >= kOf(v)) {
            val nlo = v.lo + b * w
            v.hi = math.min(v.hi, nlo + w - 1)
            v.lo = nlo
            v.above = cum
            found = true
          } else { cum += c; b -= 1 }
        }
        require(found, s"dsir cut refinement lost the $l stratum")
      }
    }
    val cuts = st.toSeq.map { case (l, v) => (l, v.lo) }.toDF("lang", "cut")
    val around = d.join(broadcast(cuts), Seq("lang"))
      .groupBy("lang")
      .agg(sum(when(col("lw") > col("cut"), 1L).otherwise(0L)).as("gtc"),
        sum(when(col("lw") > col("cut"), col("lw")).otherwise(0L)).as("gts"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Spark's round(double, 6) semantics exactly (HALF_UP over the
    // canonical decimal form), and the window form's operand order
    // (sum / 1e6 / count), so the hash matches the declarative oracle.
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    st.toSeq.map { case (l, v) =>
      val k = kOf(v)
      val (gtc, gts) = around(l)
      // ties at the cut all score v.lo: selected sum is exact without
      // ever naming which tied doc_ids the rank would have kept
      val selSum = gts + v.lo * (k - gtc)
      (l, v.n, k, r6(v.s.toDouble / 1000000.0 / v.n),
        r6(selSum.toDouble / 1000000.0 / k))
    }.toDF("lang", "n_docs", "n_selected", "mean_logw", "mean_logw_sel")
      .orderBy("lang")
  }

  /** Quality-classifier TRAINING, in-engine: the fasttext-style linear
    * filter real curation pipelines train to separate "trusted exemplar"
    * text from the raw crawl (the GPT-3 / LLaMA quality-filter recipe),
    * here as a batch perceptron over the DSIR feature space — unigrams
    * hashed into the FIXED 1024-bucket vocabulary, label +1 for the
    * `src0` exemplar slice, −1 otherwise. Three batch passes: pass k
    * computes every doc's margin m = Σ_b w_b·x_db under the current
    * weights, then adds Σ y·x over the misclassified set (y·m ≤ 0) to
    * the weights — ALL arithmetic is exact BIGINT (integer counts ×
    * integer weights), so margins, the update, and the per-pass training
    * accuracies hash identically cross-engine with no rounding discipline
    * needed until the final accuracy ratio.
    *
    * Scale: the (doc, bucket, count) frame is built once, repartitioned
    * by doc_id, and persisted — each pass's margin aggregate reuses that
    * partitioning (zero corpus exchanges per pass), the weight table
    * rides in a 1024-row broadcast, and the gradient collapses map-side
    * to ≤1024 rows before its only exchange. Driver state is the 1024
    * weights — bounded by the FIXED feature vocabulary, never the corpus
    * (the DSIR driver-state discipline). The oracle replays the three
    * passes as unrolled declarative CTEs. */
  /** Shared oracle CTE body of the classifier family (token hash →
    * feature counts → 3 unrolled perceptron passes → per-doc margins
    * m1/m2/m3) — ONE val interpolated into both the training row and
    * the filter-application row, so the two oracles cannot disagree on
    * the training arithmetic. */
  private val clfCtes =
    s"""toks AS (
       |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |xc AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN source = 'src0' THEN 1 ELSE -1 END AS y,
       |    ${graft.functions.PortableHash.duck("t")} % 1024 AS b,
       |    CAST(COUNT(*) AS BIGINT) AS x
       |  FROM toks GROUP BY 1, 2, 3, 4),
       |w1 AS (SELECT b, CAST(SUM(y * x) AS BIGINT) AS w FROM xc GROUP BY b),
       |m1 AS (
       |  SELECT xc.doc_id, xc.lang, xc.y, CAST(SUM(xc.x * w1.w) AS BIGINT) AS m
       |  FROM xc JOIN w1 USING (b) GROUP BY 1, 2, 3),
       |g2 AS (
       |  SELECT xc.b, CAST(SUM(xc.y * xc.x) AS BIGINT) AS g
       |  FROM xc JOIN (SELECT doc_id FROM m1 WHERE y * m <= 0) mis USING (doc_id)
       |  GROUP BY xc.b),
       |w2 AS (SELECT w1.b, w1.w + COALESCE(g2.g, 0) AS w
       |  FROM w1 LEFT JOIN g2 USING (b)),
       |m2 AS (
       |  SELECT xc.doc_id, xc.lang, xc.y, CAST(SUM(xc.x * w2.w) AS BIGINT) AS m
       |  FROM xc JOIN w2 USING (b) GROUP BY 1, 2, 3),
       |g3 AS (
       |  SELECT xc.b, CAST(SUM(xc.y * xc.x) AS BIGINT) AS g
       |  FROM xc JOIN (SELECT doc_id FROM m2 WHERE y * m <= 0) mis USING (doc_id)
       |  GROUP BY xc.b),
       |w3 AS (SELECT w2.b, w2.w + COALESCE(g3.g, 0) AS w
       |  FROM w2 LEFT JOIN g3 USING (b)),
       |m3 AS (
       |  SELECT xc.doc_id, xc.lang, xc.y, CAST(SUM(xc.x * w3.w) AS BIGINT) AS m
       |  FROM xc JOIN w3 USING (b) GROUP BY 1, 2, 3)""".stripMargin

  /** Spark side of the shared classifier pipeline: the 3-pass training
    * loop over the once-shuffled feature frame, returning the persisted
    * per-doc margin frames (m1, m2, m3) — shared by the training row and
    * the filter-application row (persistScratch dedups the sub-DAGs by
    * canonical plan, so in one module run the corpus trains once). */
  private[graft] def clfMargins(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    clfTrain(spark, dir) match { case (m1, m2, m3, _) => (m1, m2, m3) }

  /** Training loop returning the margin frames AND the final weight map
    * — the serving artifact a streaming filter broadcasts
    * (StreamingSpec's batch/stream parity test). */
  private[graft] def clfTrain(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      Map[Long, Long]) = {
    val spk = spark
    import spk.implicits._
    val xc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(col("source") === "src0", 1L).otherwise(-1L).as("y"),
        explode(split(col("text"), " ")).as("t"))
      .withColumn("b",
        expr(s"(${graft.functions.PortableHash.spark("t")}) % 1024"))
      .groupBy("doc_id", "lang", "y", "b")
      .agg(count(lit(1)).cast("bigint").as("x"))
      // one corpus shuffle, up front: every later per-doc margin
      // aggregate and the misclassified-set join reuse this partitioning.
      // The partition count is pinned EXPLICITLY: a bare repartition(col)
      // is AQE-coalescible, which leaves the cached plan's output
      // partitioning unusable to later passes (each would re-exchange).
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"))
      .persistScratch()
    def wFrame(w: Map[Long, Long]) =
      w.toSeq.sortBy(_._1).toDF("b", "w")
    def margins(w: org.apache.spark.sql.DataFrame) = xc.join(broadcast(w), "b")
      .groupBy("doc_id", "lang", "y")
      .agg(sum(col("x") * col("w")).cast("bigint").as("m"))
    def gradient(mis: org.apache.spark.sql.DataFrame): Map[Long, Long] = xc
      .join(mis.select("doc_id"), "doc_id")
      .groupBy("b").agg(sum(col("y") * col("x")).cast("bigint").as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pass 1 from w=0: every margin is 0, so every doc is misclassified
    // and the first weights ARE the full label-weighted bucket sums
    var w: Map[Long, Long] =
      xc.groupBy("b").agg(sum(col("y") * col("x")).cast("bigint").as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m1 = margins(wFrame(w)).persistScratch()
    val g2 = gradient(m1.filter(col("y") * col("m") <= 0))
    w = w.map { case (b, v) => b -> (v + g2.getOrElse(b, 0L)) }
    val m2 = margins(wFrame(w)).persistScratch()
    val g3 = gradient(m2.filter(col("y") * col("m") <= 0))
    w = w.map { case (b, v) => b -> (v + g3.getOrElse(b, 0L)) }
    val m3 = margins(wFrame(w)).persistScratch()
    (m1, m2, m3, w)
  }

  val qQualityClf = Q(
    "q_quality_clf_train",
    s"""WITH $clfCtes
       |SELECT m1.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN m1.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  round(CAST(SUM(CASE WHEN m1.y * m1.m > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS acc_p1,
       |  round(CAST(SUM(CASE WHEN m2.y * m2.m > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS acc_p2,
       |  round(CAST(SUM(CASE WHEN m3.y * m3.m > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS acc_p3,
       |  CAST(SUM(m1.m) AS BIGINT) AS msum_p1,
       |  CAST(SUM(m2.m) AS BIGINT) AS msum_p2,
       |  CAST(SUM(m3.m) AS BIGINT) AS msum_p3
       |FROM m1 JOIN m2 USING (doc_id, lang, y) JOIN m3 USING (doc_id, lang, y)
       |GROUP BY m1.lang ORDER BY m1.lang""".stripMargin
  ) { (spark, dir) =>
    val (m1, m2, m3) = clfMargins(spark, dir)
    m1.select(col("doc_id"), col("lang"), col("y"), col("m").as("m1"))
      .join(m2.select(col("doc_id"), col("m").as("m2")), "doc_id")
      .join(m3.select(col("doc_id"), col("m").as("m3")), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_pos"),
        round(sum(when(col("y") * col("m1") > 0, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("acc_p1"),
        round(sum(when(col("y") * col("m2") > 0, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("acc_p2"),
        round(sum(when(col("y") * col("m3") > 0, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("acc_p3"),
        // the per-pass margin sums make the weight UPDATES observable
        // even when accuracy plateaus (on an imbalanced inseparable
        // corpus the always-negative plateau is reached after pass 1,
        // so acc alone could not distinguish training from a no-op)
        sum(col("m1")).cast("bigint").as("msum_p1"),
        sum(col("m2")).cast("bigint").as("msum_p2"),
        sum(col("m3")).cast("bigint").as("msum_p3"))
      .orderBy("lang")
  }

  /** Quality-classifier APPLICATION — the filter step that consumes
    * [[qQualityClf]]'s trained weights: keep every document whose final
    * margin is above its language's MEAN margin (the integer-exact
    * comparison m·n > Σm, so no division or rounding can flip a keep
    * decision cross-engine), and grade the filter by what a pipeline
    * operator actually reads off it — does the kept slice ENRICH
    * exemplar (src0) density over the corpus base rate. Shares
    * [[clfMargins]] / the clfCtes oracle body with the training row, so
    * the two rows cannot disagree on the training arithmetic; in one
    * module run the corpus trains once (persistScratch dedups the
    * shared sub-DAGs by canonical plan). */
  val qQualityClfFilter = Q(
    "q_quality_clf_filter",
    s"""WITH $clfCtes,
       |lt AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS s
       |  FROM m3 GROUP BY lang)
       |SELECT m3.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN m3.m * lt.n > lt.s THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN m3.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN m3.m * lt.n > lt.s AND m3.y = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept_pos,
       |  round(CAST(SUM(CASE WHEN m3.y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS pos_rate_all,
       |  round(CAST(SUM(CASE WHEN m3.m * lt.n > lt.s AND m3.y = 1 THEN 1 ELSE 0
       |      END) AS DOUBLE)
       |    / greatest(SUM(CASE WHEN m3.m * lt.n > lt.s THEN 1 ELSE 0 END), 1), 6)
       |    AS pos_rate_kept
       |FROM m3 JOIN lt USING (lang)
       |GROUP BY m3.lang ORDER BY m3.lang""".stripMargin
  ) { (spark, dir) =>
    val (_, _, m3) = clfMargins(spark, dir)
    val lt = m3.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("m").cast("bigint").as("s"))
    m3.join(broadcast(lt), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("m") * col("n") > col("s"), 1L).otherwise(0L))
          .cast("bigint").as("n_kept"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_pos"),
        sum(when(col("m") * col("n") > col("s") && col("y") === 1, 1L)
          .otherwise(0L)).cast("bigint").as("n_kept_pos"),
        round(sum(when(col("y") === 1, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("pos_rate_all"),
        // greatest(n_kept, 1): a stratum where nothing beats the mean
        // (e.g. one doc, m·1 = Σm) must yield 0.0, not a divide-by-zero
        // under ANSI (RobustnessSpec's degenerate warehouse)
        round(sum(when(col("m") * col("n") > col("s") && col("y") === 1, 1L)
            .otherwise(0L)).cast("double")
          / greatest(sum(when(col("m") * col("n") > col("s"), 1L)
            .otherwise(0L)), lit(1L)), 6)
          .as("pos_rate_kept"))
      .orderBy("lang")
  }

  /** Ordered funnel with a 48 h conversion window: first view → first
    * click within 48 h of it → first purchase within 48 h of that click.
    * Three conditional-min aggregations keyed on user_id, left-joined on
    * the same key — at scale one hash partitioning on user_id serves all
    * stages, and no per-user event list is ever materialized (contrast the
    * collect_list-then-scan anti-pattern). */
  val qEventsFunnel = Q(
    "q_events_funnel",
    """WITH u AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN u ON e.user_id = u.user_id
      |  WHERE e.event_type = 'click' AND e.ts > u.t1
      |    AND e.ts <= u.t1 + INTERVAL 48 HOUR GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |    AND e.ts <= c.t2 + INTERVAL 48 HOUR GROUP BY e.user_id)
      |SELECT count(*) AS n_users, count(u.t1) AS n_viewed,
      |  count(c.t2) AS n_clicked_after, count(p.t3) AS n_purchased_after
      |FROM u LEFT JOIN c ON u.user_id = c.user_id
      |       LEFT JOIN p ON u.user_id = p.user_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val u = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(u, Seq("user_id"))
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 48 HOURS"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 48 HOURS"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    u.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_users"), count(col("t1")).as("n_viewed"),
        count(col("t2")).as("n_clicked_after"),
        count(col("t3")).as("n_purchased_after"))
  }

  /** PII-style redaction sweep: flag-and-count documents whose text
    * contains "sensitive" tokens (the fixture vocabulary's `key`/`value`
    * stand in for emails/SSNs), plus the post-redaction length delta.
    * Per-row regexp only — codegen'd, shuffle-free until the final small
    * per-lang rollup. The same \b-bounded RE2-safe pattern runs on both
    * engines; counts (not rewritten text) are compared, so engine-level
    * regex-replacement quirks can't hide in an unverified column. */
  val qTextRedact = Q(
    "q_text_redact",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '\b(key|value)\b', 0))) AS BIGINT)
      |    AS n_redacted,
      |  CAST(SUM(length(regexp_replace(text, '\b(key|value)\b', '<X>', 'g'))
      |           - length(text)) AS BIGINT) AS len_delta
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(expr("regexp_extract_all(text, '\\\\b(key|value)\\\\b', 0)"))
          .as("n_red"),
        (length(regexp_replace(col("text"), "\\b(key|value)\\b", "<X>"))
          - length(col("text"))).as("delta"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_red").cast("bigint")).as("n_redacted"),
        sum(col("delta").cast("bigint")).as("len_delta"))
      .orderBy("lang")
  }

  /** Training-mix apportionment: split a 1,000,000-token budget across
    * languages proportional to each language's token count, using
    * largest-remainder rounding (Hamilton's method) so the allocations
    * are integers that sum EXACTLY to the budget. Pure integer
    * arithmetic — floor quotas from bigint division, the leftover seats
    * assigned by remainder rank with a lang tiebreak — so both engines
    * agree bit-for-bit. The shape is two tiny aggregates + a rank over
    * |langs| rows: nothing here grows with the corpus except the first
    * token count. */
  val qDocMixBudget = Q(
    "q_doc_mix_budget",
    """WITH t AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total, COUNT(*) AS n_langs FROM t),
      |q AS (
      |  SELECT lang, toks,
      |    CAST((toks * 1000000) // total AS BIGINT) AS floor_alloc,
      |    CAST((toks * 1000000) % total AS BIGINT) AS rem
      |  FROM t, tot),
      |r AS (
      |  SELECT lang, toks, floor_alloc,
      |    CAST(row_number() OVER (ORDER BY rem DESC, lang) AS INT) AS rk,
      |    CAST(1000000 - SUM(floor_alloc) OVER () AS BIGINT) AS leftover
      |  FROM q)
      |SELECT lang, toks, CAST(floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc
      |FROM r ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("toks"))
    val tot = t.agg(sum("toks").as("total"))
    val q = t.crossJoin(tot)
      .select(col("lang"), col("toks"),
        expr("(toks * 1000000) div total").as("floor_alloc"),
        expr("(toks * 1000000) % total").as("rem"))
    val w = Window.orderBy(desc("rem"), asc("lang"))
    val wAll = Window.partitionBy(lit(1))
    q.select(col("lang"), col("toks"), col("floor_alloc"),
      row_number().over(w).as("rk"),
      (lit(1000000L) - sum("floor_alloc").over(wAll)).as("leftover"))
      .select(col("lang"), col("toks"),
        (col("floor_alloc") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("lang")
  }

  /** Temperature-scaled training mix: per-language sampling shares
    * w_l = n_l^α / Σ n^α with α = 0.5 — the standard flattening move
    * (multilingual pretraining up-samples low-resource languages so the
    * head language stops dominating) — plus each language's upsampling
    * factor vs its natural share. Token counts are exact BIGINTs; sqrt is
    * a correctly-rounded IEEE op on an exactly-represented input, so both
    * engines see identical w; the ≤|langs|-term double sum can differ in
    * association order, and round6 absorbs that last-ulp wiggle (the
    * cooccur/tfidf precedent). Nothing after the first aggregate grows
    * with the corpus. */
  val qDocMixTemperature = Q(
    "q_doc_mix_temperature",
    """WITH t AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY lang),
      |s AS (SELECT lang, toks, sqrt(CAST(toks AS DOUBLE)) AS w FROM t),
      |tot AS (SELECT SUM(w) AS sw, CAST(SUM(toks) AS BIGINT) AS st FROM s)
      |SELECT lang, toks,
      |  round(w / sw, 6) AS mix_share,
      |  round((w / sw) / (CAST(toks AS DOUBLE) / st), 6) AS upsample
      |FROM s, tot ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val t = Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("toks"))
      .select(col("lang"), col("toks"), sqrt(col("toks").cast("double")).as("w"))
    val tot = t.agg(sum("w").as("sw"), sum("toks").as("st"))
    t.crossJoin(tot)
      .select(col("lang"), col("toks"),
        round(col("w") / col("sw"), 6).as("mix_share"),
        round((col("w") / col("sw"))
          / (col("toks").cast("double") / col("st")), 6).as("upsample"))
      .orderBy("lang")
  }

  /** Per-language MEDIAN quality gate: keep documents strictly longer
    * (in tokens) than their language's exact median — the
    * quantile-threshold curation cut (absolute thresholds drift as the
    * corpus mix shifts; a per-stratum quantile self-calibrates). The
    * median is the exact interpolated percentile on integer token counts
    * (interpolation factor 0.5, (a+b)/2 exact in doubles — Spark
    * `percentile` and DuckDB `quantile_cont` agree bit-for-bit), computed
    * per language (|langs| rows) and joined back for the gate count. At
    * scale the exact per-group sort is the cost — the documented switch
    * is approx_percentile when |group| no longer sorts in one task. */
  val qDocMedianGate = Q(
    "q_doc_median_gate",
    """WITH m AS (
      |  SELECT lang,
      |    quantile_cont(CAST(len(string_split(text, ' ')) AS BIGINT), 0.5) AS med
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, CAST(m.med AS DOUBLE) AS median_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN len(string_split(d.text, ' ')) > m.med
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents d JOIN m ON d.lang = m.lang
      |GROUP BY d.lang, m.med ORDER BY d.lang""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("bigint").as("nt"))
    val m = docs.groupBy("lang")
      .agg(percentile(col("nt"), lit(0.5)).as("med"))
    docs.join(m, "lang")
      .groupBy("lang", "med")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nt") > col("med"), 1).otherwise(0)).as("n_kept"))
      .select(col("lang"), col("med").as("median_tokens"),
        col("n_docs"), col("n_kept"))
      .orderBy("lang")
  }

  /** Cohort retention: users grouped by their first-seen day, tracked for
    * 7 day-offsets — the activation matrix every analytics pipeline
    * builds. Two aggregations on user_id (first-seen + distinct active
    * days) and a count per (cohort, offset): at scale one user_id
    * partitioning serves the first two, and the matrix itself is tiny. */
  val qEventsRetention = Q(
    "q_events_retention",
    """WITH f AS (
      |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      |  FROM events),
      |m AS (
      |  SELECT f.cohort, CAST(a.d - f.cohort AS INT) AS offset_d, a.user_id
      |  FROM a JOIN f ON a.user_id = f.user_id
      |  WHERE a.d - f.cohort BETWEEN 0 AND 7)
      |SELECT cohort, offset_d, COUNT(DISTINCT user_id) AS n_users
      |FROM m GROUP BY cohort, offset_d
      |ORDER BY cohort, offset_d""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
    val f = ev.groupBy("user_id").agg(min("d").as("cohort"))
    val a = ev.distinct()
    a.join(f, "user_id")
      .select(col("cohort"), datediff(col("d"), col("cohort")).as("offset_d"),
        col("user_id"))
      .filter(col("offset_d").between(0, 7))
      .groupBy("cohort", "offset_d")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "offset_d")
  }


  /** Winsorized (outlier-clipped) mean: per market segment, the mean
    * account balance after dropping rows outside the [p05, p95] band —
    * the standard robust-statistics gate a feature pipeline applies
    * before normalization. Thresholds are exact interpolated percentiles
    * ROUNDED to 6 dp on both engines before the comparison, so a
    * boundary row can never flip on a sub-ulp difference (balances have
    * 2 dp). Two passes: a tiny per-group percentile table joined back
    * (broadcast — one row per segment), then the filtered exact-unit
    * mean. */
  val qClipOutliers = Q(
    "q_clip_outliers",
    """WITH p AS (
      |  SELECT c_mktsegment,
      |    round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.05), 6) AS p05,
      |    round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.95), 6) AS p95
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_mktsegment,
      |  COUNT(*) AS n_kept,
      |  SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*) AS clipped_mean
      |FROM customer c JOIN p ON c.c_mktsegment = p.c_mktsegment
      |WHERE c_acctbal >= p05 AND c_acctbal <= p95
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin
  ) { (spark, dir) =>
    val cust = Tables.customer(spark, dir)
    val p = cust.groupBy("c_mktsegment")
      .agg(round(expr("percentile(c_acctbal, 0.05)"), 6).as("p05"),
        round(expr("percentile(c_acctbal, 0.95)"), 6).as("p95"))
    cust.join(broadcast(p), "c_mktsegment")
      .filter(col("c_acctbal") >= col("p05") && col("c_acctbal") <= col("p95"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_kept"),
        graft.functions.Det.exactAvg(col("c_acctbal"), 100).as("clipped_mean"))
      .orderBy("c_mktsegment")
  }

  /** Time-weighted average value (TWAP) per user: each reading weighted by
    * how long it was current (gap to the next event), all in exact
    * integer units — value cents x duration microseconds sums as a
    * DECIMAL(38,0), one double division at the end. The single window
    * (lead over user, ts) and the final per-user rollup share one
    * user_id partitioning. */
  val qEventsTwap = Q(
    "q_events_twap",
    s"""WITH g AS (
      |  SELECT user_id,
      |    ${graft.functions.Det.sqlUnitsWide("value", 100)} AS v_c,
      |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_us(ts) AS dt_us
      |  FROM events WHERE user_id < 100)
      |SELECT user_id,
      |  COUNT(dt_us) AS n_intervals,
      |  CAST(SUM(v_c * dt_us) AS DOUBLE) / SUM(dt_us) / 100.0 AS twap
      |FROM g WHERE dt_us IS NOT NULL
      |GROUP BY user_id
      |HAVING SUM(dt_us) > 0
      |ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .filter(col("user_id") < 100)
      .select(col("user_id"),
        graft.functions.Det.unitsWide(col("value"), 100).as("v_c"),
        (unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts"))).as("dt_us"))
      .filter(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(count(col("dt_us")).as("n_intervals"),
        sum((col("v_c") * col("dt_us")).cast("decimal(38,0)")).as("num"),
        sum(col("dt_us")).as("span_us"))
      // a user whose whole observed span is zero (every event at the same
      // instant) has no time-weighted average — excluded on BOTH engines
      // rather than dividing by zero (job-killing under ANSI mode).
      .filter(col("span_us") > 0)
      .select(col("user_id"), col("n_intervals"),
        (col("num").cast("double") / col("span_us") / lit(100.0)).as("twap"))
      .orderBy("user_id")
  }

  /** Gap-based batch sessionization: a new session starts when a user is
    * idle > 30 min; per-session event count and exact µs duration. The
    * batch twin of q_stream_session's session windows, as behavioral
    * pipelines run it over history: two window passes (lag → boundary
    * flag, running sum → session index) and the rollup, ALL on one
    * user_id partitioning — one exchange end to end, no self-join.
    * Timestamps stay in integer epoch-µs (`unix_micros`/`epoch_us`) so
    * every boundary decision and duration is exact in both engines; ties
    * on ts break on event_id for a deterministic event order. Restricted
    * to user_id < 200: the output is one row per session and the graded
    * artifact stays bounded while exercising the full operator. */
  val qEventsSessionize = Q(
    "q_events_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      |  WHERE user_id < 200),
      |f AS (
      |  SELECT user_id, us,
      |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |              > 1800000000
      |           OR LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |              IS NULL
      |         THEN 1 ELSE 0 END AS new_s,
      |    event_id
      |  FROM e),
      |s AS (
      |  SELECT user_id, us,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM f)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(spark, dir)
      .filter(col("user_id") < 200)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag("us", 1).over(w) > 1800000000L ||
          lag("us", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("duration_us"))
      .orderBy("user_id", "session_seq")
  }


  /** Last-touch attribution: every purchase is credited to the user's
    * most recent PRIOR non-purchase event within a 7-day lookback, else
    * 'direct' — the conversion-credit readout behavioral pipelines join
    * against spend. One window pass over one user_id partitioning: two
    * last(..., ignoreNulls) columns over the same ROWS frame (they
    * resolve to the same predecessor row, so type and timestamp stay
    * consistent), then a purchase-filtered rollup. Exact integer cents
    * and epoch-µs arithmetic; ties on ts break on event_id. */
  val qEventsAttribution = Q(
    "q_events_attribution",
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    ${graft.functions.Det.sqlUnitsWide("value", 100)} AS v_c
      |  FROM events),
      |t AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
      |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN us END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_us
      |  FROM e)
      |SELECT
      |  CASE WHEN lt_us IS NOT NULL AND us - lt_us <= 604800000000
      |       THEN lt_type ELSE 'direct' END AS channel,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(SUM(v_c) AS BIGINT) AS revenue_cents
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        graft.functions.Det.unitsWide(col("value"), 100).as("v_c"))
      .withColumn("lt_type",
        last(when(col("event_type") =!= "purchase", col("event_type")), true)
          .over(w))
      .withColumn("lt_us",
        last(when(col("event_type") =!= "purchase", col("us")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("lt_us").isNotNull &&
          col("us") - col("lt_us") <= 604800000000L, col("lt_type"))
          .otherwise("direct").as("channel"),
        col("v_c"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum("v_c").cast("long").as("revenue_cents"))
      .orderBy("channel")
  }

  /** DAU / trailing-7-day WAU: daily active users plus the rolling
    * 7-day distinct-user count. Rolling DISTINCT cannot ride a window
    * frame (distinct doesn't decompose), so the scale shape is: dedup to
    * (day, user) pairs once — the only corpus-sized shuffle — then a
    * bounded range join of each day against its 7-day lookback window of
    * pairs, counting distinct per anchor day. Cost is |days| x 7 x
    * |daily actives|, independent of raw event volume. */
  val qEventsWau = Q(
    "q_events_wau",
    """WITH du AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT days.d,
      |  (SELECT COUNT(*) FROM du WHERE du.d = days.d) AS dau,
      |  (SELECT COUNT(DISTINCT u2.user_id) FROM du u2
      |   WHERE u2.d BETWEEN days.d - 6 AND days.d) AS wau
      |FROM days
      |ORDER BY days.d""".stripMargin
  ) { (spark, dir) =>
    val du = Tables.events(spark, dir)
      .select(to_date(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct()
      .persistScratch() // anchors, DAU and the lookback join all read it
    val days = du.select(col("d")).distinct()
    val dau = du.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = days.select(col("d").as("anchor"))
      .join(du, datediff(col("anchor"), col("d")).between(0, 6))
      .groupBy("anchor")
      .agg(countDistinct("user_id").as("wau"))
    dau.join(wau, col("d") === col("anchor"))
      .select(col("d"), col("dau"), col("wau"))
      .orderBy("d")
  }


  /** Volume anomaly scoring: each day's event count against the mean and
    * sample-stddev of the preceding 7 days (frame excludes the current
    * row — the monitored value must not contaminate its own baseline).
    * Counts are exact ints; the z-score is float arithmetic over them,
    * rounded to 6 dp on both engines. Days with fewer than 2 baseline
    * points emit NULL (stddev undefined) on both engines. */
  val qEventsAnomaly = Q(
    "q_events_anomaly",
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY day)
      |SELECT day, n,
      |  round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 6) AS zscore
      |FROM d
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |ORDER BY day""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    Tables.events(spark, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("day"), col("n"),
        round((col("n") - avg("n").over(w)) / stddev_samp("n").over(w), 6)
          .as("zscore"))
      .orderBy("day")
  }


  /** Equal-frequency feature binning: decile buckets of customer balance
    * via ntile(10) with a custkey tiebreak (ties at bucket boundaries
    * resolve identically on both engines), then per-bin population stats
    * in exact cents — the feature-engineering discretization step. One
    * global window (the feature table is per-entity, far smaller than the
    * fact data) + a 10-row rollup. */
  val qFeatureBin = Q(
    "q_feature_bin",
    """WITH b AS (
      |  SELECT c_acctbal,
      |    CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS bin
      |  FROM customer)
      |SELECT bin, COUNT(*) AS n,
      |  CAST(MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS lo_cents,
      |  CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS hi_cents,
      |  SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*) AS mean_bal
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("c_acctbal", "c_custkey")
    val cents = graft.functions.Det.units(col("c_acctbal"), 100)
    Tables.customer(spark, dir)
      .select(col("c_acctbal"), col("c_custkey"))
      .withColumn("bin", ntile(10).over(w))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min(cents).as("lo_cents"), max(cents).as("hi_cents"),
        graft.functions.Det.exactAvg(col("c_acctbal"), 100).as("mean_bal"))
      .orderBy("bin")
  }


  /** Event-type transition matrix (first-order Markov statistics): for
    * each ordered (from, to) pair of consecutive same-user events, the
    * count and MLE transition probability from exact integer counts —
    * the sequence-model statistics a behavioral pipeline extracts. One
    * lag window on the (user, time) ordering, two aggregates sharing the
    * from-type key. */
  val qEventsMarkov = Q(
    "q_events_markov",
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
      |  FROM s WHERE prev_type IS NOT NULL
      |  GROUP BY from_type, to_type),
      |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY from_type)
      |SELECT c.from_type, c.to_type, c.n,
      |  round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
      |FROM c JOIN t ON c.from_type = t.from_type
      |ORDER BY c.from_type, c.to_type""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        lag("event_type", 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("from_type").agg(sum("n").as("tot"))
    c.join(t, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Revenue concentration (Pareto sweep): rank customers by exact-unit
    * revenue, then report at each revenue decile how many customers it
    * takes — "what fraction of customers carry X% of revenue". Cumulative
    * integer sums over a rank window; the decile cut compares exact
    * integers (cum x 10 >= total x d), so no float boundary exists. */
  val qOrdersPareto = Q(
    "q_orders_pareto",
    """WITH r AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |k AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rk,
      |    CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(cents) OVER () AS BIGINT) AS total,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_cust
      |  FROM r)
      |SELECT d AS decile, CAST(MIN(rk) AS BIGINT) AS n_customers,
      |  round(CAST(MIN(rk) AS DOUBLE) / MIN(n_cust), 6) AS cust_frac
      |FROM k, unnest([1,2,3,4,5,6,7,8,9]) u(d)
      |WHERE cum * 10 >= total * d
      |GROUP BY d
      |ORDER BY d""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val r = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(graft.functions.Det.units(col("o_totalprice"), 100)).as("cents"))
    val ord = Window.orderBy(desc("cents"), asc("o_custkey"))
    val all = Window.partitionBy(lit(1))
    val k = r.select(col("cents"),
      row_number().over(ord).cast("long").as("rk"),
      sum("cents").over(ord.rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
      sum("cents").over(all).as("total"),
      count(lit(1)).over(all).as("n_cust"))
    k.crossJoin(spark.range(1, 10).select(col("id").cast("int").as("decile")))
      .filter(col("cum") * 10 >= col("total") * col("decile"))
      .groupBy("decile")
      .agg(min("rk").as("n_customers"),
        round(min("rk").cast("double") / min("n_cust"), 6).as("cust_frac"))
      .orderBy("decile")
  }


  /** A/B-split lift readout: users deterministically hash-split 50/50,
    * per-arm user counts, purchasers, and conversion rate, plus the
    * pooled two-proportion z statistic — the experiment-analysis readout,
    * with the assignment reproducible on any engine (no RNG). Counts are
    * exact; the rate and z are float arithmetic over exact integers with
    * the same operation order on both engines, rounded to 6 dp. */
  val qEventsAbLift = Q(
    "q_events_ab_lift",
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN ${graft.functions.PortableHash.duck("concat('ab-', user_id)")} % 2 = 0
       |         THEN 'A' ELSE 'B' END AS arm,
       |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) AS converted
       |  FROM events GROUP BY user_id)
       |SELECT arm, COUNT(*) AS n_users,
       |  CAST(SUM(converted) AS BIGINT) AS n_converted,
       |  round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate
       |FROM u GROUP BY arm ORDER BY arm""".stripMargin
  ) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      .withColumn("arm",
        when(expr(s"${graft.functions.PortableHash.spark("concat('ab-', cast(user_id as string))")} % 2 = 0"), "A")
          .otherwise("B"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum("converted").as("n_converted"),
        round(sum("converted").cast("double") / count(lit(1)), 6).as("conv_rate"))
      .orderBy("arm")
  }

  /** Per-source document cap — domain balancing, the corpus-pipeline
    * counterpart of the per-stratum sampler above: a hot domain (crawl
    * dumps, boilerplate-heavy sites) must not dominate the training mix,
    * so each source keeps at most CAP documents, chosen by deterministic
    * portable-hash order (bit-reproducible across engines, runs and task
    * retries — never engine RNG) with doc_id breaking ties. Output is the
    * decision record: per source, how many documents existed, how many
    * survive the cap, and the surviving character mass.
    *
    * Scale: one shuffle on source + a per-source ranking window. This
    * DECISION-RECORD form must see every row (n_docs counts the whole
    * domain), so no group-limit applies; the KEEP form a pipeline runs
    * (filter rk <= CAP) plans a pre-shuffle WindowGroupLimit so each task
    * retains ≤CAP rows per source before the exchange. A pathologically
    * hot single domain is exactly the skew AQE splits; the cheaper
    * two-phase form (hash-threshold prefilter to ~CAP·(1+ε), then exact
    * rank) trades a second pass for never sorting the hot domain. */
  val qDocSourceCap = Q(
    "q_doc_source_cap",
    s"""WITH ranked AS (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${graft.functions.PortableHash.duck("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
       |  FROM documents)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rk <= 10 THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS kept_chars
       |FROM ranked
       |GROUP BY source
       |ORDER BY source""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(expr(graft.functions.PortableHash.spark(
        "CAST(doc_id AS STRING)")).asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= 10, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= 10, col("n_chars")).otherwise(0L))
          .as("kept_chars"))
      .orderBy("source")
  }

  def all: Seq[Q] = Seq(qSampleHash, qSampleWeighted, qDsir, qQualityClf, qQualityClfFilter,
    qEventsFunnel, qTextRedact,
    qDocSourceCap,
    qDocMixBudget, qDocMixTemperature, qDocMedianGate, qEventsRetention,
    qClipOutliers,
    qEventsTwap, qEventsSessionize, qEventsAttribution, qEventsWau,
    qEventsAnomaly, qFeatureBin, qEventsMarkov, qOrdersPareto, qEventsAbLift)
}
