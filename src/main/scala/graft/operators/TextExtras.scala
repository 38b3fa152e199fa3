package graft.operators

import graft.sources.Scratch.PersistSyntax
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Additional training-data-pipeline text operators beyond SURVEY §2.7's
  * core set: per-document quality scoring, heuristic language-ID scoring,
  * canonical fingerprinting, n-gram shingle near-dup, regex (BPE-ish)
  * tokenization, and multimodal (binary-column) metadata extraction.
  *
  * All are per-row codegen'd expressions plus partial→final aggregates —
  * the shapes that stream through a 100 TB corpus in one pass. The n-gram
  * dedup inherits Q32's blocking + broadcast strategy.
  */
object TextExtras {

  private val stops = Seq("the", "of", "and", "a", "to", "in", "is", "on")
  private val stopsSql = stops.map(s => s"'$s'").mkString(", ")

  /** Per-document quality metrics: token count, average token length,
    * stopword ratio, and a banded quality label. All ratios are exact
    * int/int divisions — deterministic cross-engine. */
  val qTextQuality = Q(
    "q_text_quality",
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       |  (n_chars - (len(string_split(text, ' ')) - 1))
       |    / len(string_split(text, ' ')) AS avg_tok_len,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopsSql))) AS INT)
       |    AS n_stop,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopsSql))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stop_ratio,
       |  CASE WHEN len(string_split(text, ' ')) < 30 THEN 'short'
       |       WHEN len(string_split(text, ' ')) < 70 THEN 'medium'
       |       ELSE 'long' END AS length_band
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    val tk = split(col("text"), " ")
    val nTok = size(tk)
    val nStop = size(filter(tk, t => t.isin(stops: _*)))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        ((col("n_chars") - (nTok - lit(1))) / nTok).as("avg_tok_len"),
        nStop.as("n_stop"),
        (nStop.cast("double") / nTok).as("stop_ratio"),
        when(nTok < 30, "short").when(nTok < 70, "medium").otherwise("long")
          .as("length_band"))
      .orderBy("doc_id")
  }

  /** Heuristic language-ID scoring: character-class ratios → predicted
    * class, tabulated against the labeled lang (the fixture corpus shares
    * one vocabulary, so this exercises the scoring machinery — the
    * per-class thresholds — not real linguistics). */
  val qLangId = Q(
    "q_lang_id",
    """SELECT lang, predicted, COUNT(*) AS n_docs
      |FROM (
      |  SELECT lang,
      |    CASE WHEN length(regexp_replace(text, '[^a-z]', '', 'g')) = 0
      |         THEN 'consonant-heavy'
      |         WHEN CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
      |              / length(regexp_replace(text, '[^a-z]', '', 'g')) >= 0.4
      |         THEN 'vowel-heavy'
      |         WHEN CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
      |              / length(regexp_replace(text, '[^a-z]', '', 'g')) >= 0.3
      |         THEN 'balanced'
      |         ELSE 'consonant-heavy' END AS predicted
      |  FROM documents)
      |GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin
  ) { (spark, dir) =>
    val vowels = length(regexp_replace(col("text"), "[^aeiou]", ""))
    val letters = length(regexp_replace(col("text"), "[^a-z]", ""))
    val ratio = vowels.cast("double") / letters
    // zero-letter guard FIRST: CASE branches evaluate lazily, so the
    // division never runs on a letterless doc — one poison row would
    // otherwise kill the whole job under ANSI mode (RobustnessSpec).
    Tables.documents(spark, dir)
      .select(col("lang"),
        when(letters === 0, "consonant-heavy")
          .when(ratio >= 0.4, "vowel-heavy")
          .when(ratio >= 0.3, "balanced")
          .otherwise("consonant-heavy").as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — the classic "same bag of words" near-dup key. Reported per
    * source: distinct fingerprints vs docs (collisions = clones). */
  val qTextFingerprint = Q(
    "q_text_fingerprint",
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(array_to_string(
      |    list_sort(list_distinct(string_split(text, ' '))), ' '))) AS n_fingerprints
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("fp",
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct("fp").as("n_fingerprints"))
      .orderBy("source")
  }

  /** Document-frequency ceiling for the shingle inverted index: a shingle
    * present in more than this many documents (per language) is template
    * boilerplate — it carries no near-dup signal, but its bucket's pair
    * mass grows QUADRATICALLY with df, so one hot shingle can dominate
    * the entire inverted-index join (the q_dedup_bucket_skew failure
    * mode). Dropping df > cap shingles BEFORE the join bounds any single
    * shingle's contribution at cap·(cap−1)/2 pairs while leaving every
    * discriminative shingle intact; similarity is then computed over the
    * capped sets on BOTH engines (the df ≥ 5 q_text_cooccur precedent,
    * in the other direction). ScaleSpec proves a planted all-docs
    * boilerplate shingle never reaches the join. */
  private[operators] val shingleDfCap = 64

  /** Shared (doc_id, lang, s) 3-token-shingle incidence for the n-gram
    * near-dup family, df-capped per [[shingleDfCap]]. Shingles are built
    * ARRAY-LOCALLY ([[graft.functions.Shingles]]): the per-doc distinct
    * set is assembled inside the token array and exploded ONCE, so the
    * only exchange the incidence pays is the (lang, s) shuffle the df cap
    * and the inverted-index join both need — the window-lead construction
    * this replaces paid two extra token-stream-sized exchanges first.
    * The df count rides a window over that same (lang, s) shuffle, so the
    * cap costs no extra exchange of the incidence list. Persisted: both
    * join sides and the per-doc size aggregate read it. */
  private[graft] def shingleInc(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"),
        explode_outer(graft.functions.Shingles.distinctSet(col("tk"), 3)).as("s"))
      .filter(col("s").isNotNull) // outer explode: the Shingles discipline
      .withColumn("df", count(lit(1)).over(Window.partitionBy("lang", "s")))
      .filter(col("df") <= shingleDfCap)
      .drop("df")
      .persistScratch()
  }

  /** Shared DuckDB CTE chain mirroring [[shingleInc]] + the inverted-index
    * intersection counts: capped incidence `keep`, per-doc capped size
    * `sz`, unordered-pair intersection `inter`. */
  private val shingleIncDuck =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS sh
       |  FROM documents),
       |inc AS (SELECT doc_id, lang, unnest(sh) AS s FROM t),
       |hot AS (SELECT lang, s FROM inc GROUP BY lang, s
       |        HAVING COUNT(*) > $shingleDfCap),
       |keep AS (SELECT i.doc_id, i.lang, i.s FROM inc i
       |  ANTI JOIN hot h ON i.lang = h.lang AND i.s = h.s),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS sz
       |       FROM keep GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(COUNT(*) AS INT) AS inter
       |  FROM keep a JOIN keep b
       |    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** n-gram (3-token shingle) Jaccard near-dup: far more discriminative
    * than token-set Jaccard on a small vocabulary (word ORDER matters), so
    * the threshold separates cleanly. Inverted-index join on the shingle
    * (see [[shingleInc]]); same exact-integer threshold arithmetic as Q32;
    * similarity is over the df-capped shingle sets ([[shingleDfCap]]) —
    * boilerplate-blind on both engines. */
  val qDedupNgram = Q(
    "q_dedup_ngram",
    s"""$shingleIncDuck
       |SELECT a_id, b_id,
       |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
       |FROM inter JOIN sz sa ON sa.doc_id = a_id
       |           JOIN sz sb ON sb.doc_id = b_id
       |WHERE 3 * inter >= sa.sz + sb.sz
       |ORDER BY a_id, b_id""".stripMargin
  ) { (spark, dir) =>
    // Inverted-index plan: equi-join the capped (doc, shingle) incidence
    // ON THE SHINGLE — |A ∩ B| falls out of a groupBy count over the
    // (pair, shared-shingle) incidences. No per-pair set operation ever
    // runs, and cost scales with the incidence count (Σ_pairs |∩|), not
    // the full pair count — the all-pairs-similarity shape that holds up
    // on a 1000-executor cluster (the shuffle key is the shingle, which
    // has high cardinality, unlike the 5-value lang block), and the df
    // cap bounds any one bucket's quadratic pair mass.
    val inc = shingleInc(spark, dir)
    val sz = inc.groupBy("doc_id", "lang").agg(count(lit(1)).cast("int").as("sz"))
    val inter = inc.select(col("doc_id").as("a_id"), col("lang"), col("s"))
      .join(inc.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("s").as("b_s")),
        col("lang") === col("b_lang") && col("s") === col("b_s") &&
        col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).cast("int").as("inter"))
    val sza = sz.select(col("doc_id").as("a_id"), col("sz").as("a_sz"))
    val szb = sz.select(col("doc_id").as("b_id"), col("sz").as("b_sz"))
    // J >= 1/2  <=>  3*i >= sa+sb  (exact ints; |union| = sa+sb-i)
    // No broadcast hints: sza/szb are one row per document (corpus-sized),
    // and the doc_id join key is high-cardinality — a shuffle join is the
    // 100 TB shape; AQE demotes to broadcast when genuinely small.
    inter.join(sza, "a_id").join(szb, "b_id")
      .filter(col("inter") * 3 >= col("a_sz") + col("b_sz"))
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double")
          / (col("a_sz") + col("b_sz") - col("inter")), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Directed CONTAINMENT near-dup: C(A→B) = |A∩B| / |A| over 3-token
    * shingles — the asymmetric companion to q_dedup_ngram's Jaccard.
    * Containment is what catches quotation/inclusion duplicates (a short
    * doc embedded verbatim in a long one): Jaccard dilutes by the big
    * doc's size and misses them, C(small→big) stays ~1. Same
    * inverted-index join as q_dedup_ngram (cost ∝ Σ|∩|, shuffle key =
    * the high-cardinality shingle, df-capped per [[shingleDfCap]]); the
    * a<b intersection counts fan out to BOTH directions afterwards — one
    * row per (contained, container) passing the exact integer threshold
    * 5·|∩| ≥ 4·|A| (C ≥ 0.8). */
  val qDedupContainment = Q(
    "q_dedup_containment",
    s"""$shingleIncDuck,
       |directed AS (
       |  SELECT a_id AS contained_id, b_id AS container_id, inter FROM inter
       |  UNION ALL
       |  SELECT b_id AS contained_id, a_id AS container_id, inter FROM inter)
       |SELECT contained_id, container_id,
       |  round(CAST(inter AS DOUBLE) / sz, 6) AS containment
       |FROM directed JOIN sz ON sz.doc_id = contained_id
       |WHERE 5 * inter >= 4 * sz
       |ORDER BY contained_id, container_id""".stripMargin
  ) { (spark, dir) =>
    val inc = shingleInc(spark, dir)
    val sz = inc.groupBy("doc_id").agg(count(lit(1)).cast("int").as("sz"))
    // intersections once per unordered pair, then both directions
    val inter = inc.select(col("doc_id").as("a_id"), col("lang"), col("s"))
      .join(inc.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("s").as("b_s")),
        col("lang") === col("b_lang") && col("s") === col("b_s") &&
        col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).cast("int").as("inter"))
    val directed = inter
      .select(col("a_id").as("contained_id"), col("b_id").as("container_id"),
        col("inter"))
      .unionAll(inter.select(col("b_id").as("contained_id"),
        col("a_id").as("container_id"), col("inter")))
    directed
      .join(sz.select(col("doc_id").as("contained_id"), col("sz")),
        "contained_id")
      .filter(col("inter") * 5 >= col("sz") * 4)
      .select(col("contained_id"), col("container_id"),
        round(col("inter").cast("double") / col("sz"), 6).as("containment"))
      .orderBy("contained_id", "container_id")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * scheme): hash every 3-token shingle, slide a window of w=4 consecutive
    * hashes, keep each window's minimum; the distinct kept hashes are the
    * document's fingerprint set. Guarantee: any shared token run of length
    * >= w + k - 1 = 6 shares at least one fingerprint, yet only ~2/(w+1) of
    * the shingle hashes are retained — the index is ~2.5x smaller than full
    * shingling at the same long-match recall, which is exactly the lever
    * that makes a 100 TB fingerprint index affordable. Pairs sharing at
    * least half of the smaller fingerprint set are emitted.
    *
    * Plan: the fingerprint set is built ARRAY-LOCALLY per document (the
    * [[graft.functions.Shingles]] discipline — shingle array, PortableHash
    * array, window-min array, distinct; zero shuffles of the token
    * stream), and candidates come from the inverted-index equi-join ON
    * THE FINGERPRINT (high-cardinality shuffle key, cost ∝ shared-
    * fingerprint incidence mass, never all pairs). */
  val qDedupWinnow = Q(
    "q_dedup_winnow",
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
       |hs AS (
       |  SELECT doc_id, lang,
       |    list_transform(range(1, len(tk) - 1), j ->
       |      ${graft.functions.PortableHash.duck("array_to_string(tk[j:j+2], ' ')")}) AS h
       |  FROM toks),
       |fp AS (
       |  SELECT doc_id, lang,
       |    list_distinct(list_transform(range(1, len(h) - 2),
       |      w -> list_aggregate(h[w:w+3], 'min'))) AS fps
       |  FROM hs),
       |inc AS (SELECT doc_id, lang, unnest(fps) AS fp FROM fp),
       |sz AS (SELECT doc_id, len(fps) AS sz FROM fp WHERE len(fps) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
       |  FROM inc a JOIN inc b
       |    ON a.lang = b.lang AND a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.a_id, p.b_id, CAST(p.shared AS INT) AS shared,
       |  round(CAST(p.shared AS DOUBLE) / least(sa.sz, sb.sz), 6) AS overlap
       |FROM pairs p
       |JOIN sz sa ON p.a_id = sa.doc_id
       |JOIN sz sb ON p.b_id = sb.doc_id
       |WHERE 2 * p.shared >= least(sa.sz, sb.sz)
       |ORDER BY a_id, b_id""".stripMargin
  ) { (spark, dir) =>
    // The whole fingerprint construction is ARRAY-LOCAL, mirroring the
    // oracle's own list_transform chain: shingle array -> per-shingle
    // PortableHash array -> min of each FULL 4-hash window (exactly
    // len(h) - 3 windows per document) -> distinct fingerprint set,
    // exploded ONCE. Winnowing selects min VALUES per window, so the
    // distinct-of-window-mins equals the distinct selected-fingerprint
    // set without ever ordering rows — the token stream never shuffles;
    // the only exchanges left are fingerprint-keyed (the join + size agg).
    val inc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"),
        graft.functions.Shingles.all(col("tk"), 3).as("sh"))
      .select(col("doc_id"), col("lang"),
        expr(s"transform(sh, s -> ${graft.functions.PortableHash.spark("s")})")
          .as("h"))
      .select(col("doc_id"), col("lang"),
        when(size(col("h")) >= 4,
          array_distinct(transform(sequence(lit(0), size(col("h")) - 4),
            w => array_min(slice(col("h"), w + lit(1), lit(4))))))
          .otherwise(array().cast("array<bigint>")).as("fps"))
      .select(col("doc_id"), col("lang"), explode_outer(col("fps")).as("fp"))
      .filter(col("fp").isNotNull) // outer explode: the Shingles discipline
      .persistScratch() // both join sides + the size aggregate
    val sz = inc.groupBy("doc_id").agg(count(lit(1)).cast("int").as("sz"))
    val pairs = inc.select(col("doc_id").as("a_id"), col("lang"), col("fp"))
      .join(inc.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("fp").as("b_fp")),
        col("lang") === col("b_lang") && col("fp") === col("b_fp") &&
        col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).cast("int").as("shared"))
    // overlap >= 1/2 <=> 2*shared >= min(|A|,|B|) — exact ints, no fp drift
    pairs
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .filter(col("shared") * 2 >= least(col("a_sz"), col("b_sz")))
      .select(col("a_id"), col("b_id"), col("shared"),
        round(col("shared").cast("double")
          / least(col("a_sz"), col("b_sz")), 6).as("overlap"))
      .orderBy("a_id", "b_id")
  }

  /** Exact duplicated-SUBSTRING span detection (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — the
    * ExactSubstr policy): the missing granularity between row-hash dedup
    * (whole doc) and shingle-Jaccard near-dup (doc pair). A width-40
    * char-gram occurring in >= 2 DISTINCT documents marks its start
    * position duplicated; maximal runs of consecutive duplicated positions
    * merge into spans (gaps-and-islands: i - row_number() is constant
    * within a run), so a shared region of m >= 40 chars reports exactly
    * one (span_start, span_len = m) row per doc — the byte ranges a
    * curation pipeline would cut.
    *
    * Scale shape: cost is LINEAR in corpus chars, never pairwise — no
    * doc×doc term at any df, which is why ExactSubstr scales where
    * Jaccard needs LSH. Exactly two data shuffles: by gram hash and by
    * doc_id (island window + span agg ride the same exchange). The
    * cross-doc test is min(doc_id) != max(doc_id) over the gram
    * partition — one Window pass, no df aggregate and no join-back, so
    * each position crosses the wire once. The wire carries
    * xxhash64(gram) (8 B), not the 40-char gram (~80 B): at 2^64 a
    * false-positive gram collision needs ~10^10 distinct grams to reach
    * even 1% probability, and the oracle recomputes the spans from RAW
    * grams, so any collision that changed the output would fail the
    * cross-engine hash — the collision-verify is built into the grading.
    * The paper uses a suffix array for L-free maximality; the fixed-L
    * gram index is the standard distributed form (spans >= L are found
    * whole, shorter ones ignored by contract). */
  private val SubL = 40

  // Shared raw-gram CTE, the prefix of every substring-dedup oracle.
  private val substringGramsDuck =
    s"""WITH g AS (
      |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
      |    substr(text, CAST(u.i AS INT), $SubL) AS gram
      |  FROM documents,
      |    unnest(range(1, CAST(n_chars AS BIGINT) - ${SubL - 2})) AS u(i)
      |  WHERE n_chars >= $SubL)""".stripMargin

  // Shared CTE prefix (raw grams -> cross-doc positions -> islands ->
  // spans), used by the span row and its per-source mass monitor.
  private val substringSpansDuck =
    s"""$substringGramsDuck,
      |p AS (
      |  SELECT doc_id, i FROM (
      |    SELECT doc_id, i,
      |      min(doc_id) OVER (PARTITION BY gram) AS dmin,
      |      max(doc_id) OVER (PARTITION BY gram) AS dmax
      |    FROM g)
      |  WHERE dmin <> dmax),
      |isl AS (SELECT doc_id, i,
      |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      |  FROM p),
      |spans AS (
      |  SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |    CAST(max(i) - min(i) + $SubL AS BIGINT) AS span_len
      |  FROM isl GROUP BY doc_id, grp)""".stripMargin

  val qDedupSubstring = Q(
    "q_dedup_substring",
    s"""$substringSpansDuck
      |SELECT doc_id, span_start, span_len FROM spans
      |ORDER BY doc_id, span_start""".stripMargin
  ) { (spark, dir) =>
    substringSpans(spark, dir).orderBy("doc_id", "span_start")
  }

  /** (doc_id, i, gh): every width-[[SubL]] gram start position with its
    * 64-bit gram hash. Explode the POSITION sequence, then substring+hash
    * post-explode: generate and project fuse into one WholeStageCodegen,
    * so neither a per-row gram-string array (~80x doc size) nor a hash
    * array is ever materialized, and both substring and xxhash64 run
    * codegen'd — the all-in-the-transform variants pay interpreted
    * per-element lambda cost instead (measured ~1.5x slower at sf0.1).
    * Only the 64-bit hash leaves the stage. */
  private def gramHashes(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, dir)
      .filter(col("n_chars") >= SubL)
      .select(col("doc_id"), col("text"), explode(expr(
        s"sequence(1, CAST(n_chars AS INT) - ${SubL - 1})")).as("ip"))
      .select(col("doc_id"), col("ip").cast("bigint").as("i"),
        xxhash64(expr(s"substring(text, ip, $SubL)")).as("gh"))

  /** Maximal islands of consecutive duplicated positions → (doc_id,
    * span_start, span_len). */
  private def islandsToSpans(
      p: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("i")
    p.withColumn("grp", col("i") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("i").as("span_start"),
        (max("i") - min("i") + lit(SubL)).cast("bigint").as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))
  }

  /** Spark side of the shared duplicated-span derivation (unordered
    * doc_id, span_start, span_len). */
  private def substringSpans(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val byGram = Window.partitionBy("gh")
    val p = gramHashes(spark, dir)
      .withColumn("dmin", min("doc_id").over(byGram))
      .withColumn("dmax", max("doc_id").over(byGram))
      .filter(col("dmin") =!= col("dmax"))
      .select(col("doc_id"), col("i"))
    islandsToSpans(p)
  }

  /** INCREMENTAL ExactSubstr: a batch of new documents (the fixture's
    * doc_id % 5 = 4 slice, q_dedup_incremental's contract) probes the
    * CORPUS gram set for duplicated spans — the ingest-time form of
    * q_dedup_substring, where only batch-vs-corpus duplication counts
    * (in-batch dups are the full row's job). Cost is O(batch): the batch
    * grams semi-join the corpus gram postings on the 64-bit hash, and at
    * 100 TB that postings set is a persisted gh-bucketed index (the
    * DedupIndex layout) the probe side shuffles once toward while the
    * corpus side never moves. Unlike the MinHash incremental row there
    * is NO verify step to schedule — gram equality IS the decision — so
    * the probe is a single semi-join + the per-batch-doc island merge. */
  val qDedupSubstringInc = Q(
    "q_dedup_substring_inc",
    s"""$substringGramsDuck,
      |cg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 <> 4),
      |p AS (
      |  SELECT doc_id, i FROM g
      |  WHERE doc_id % 5 = 4 AND gram IN (SELECT gram FROM cg)),
      |isl AS (SELECT doc_id, i,
      |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      |  FROM p)
      |SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |  CAST(max(i) - min(i) + $SubL AS BIGINT) AS span_len
      |FROM isl GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin
  ) { (spark, dir) =>
    val g = gramHashes(spark, dir)
    val corpus = g.filter(col("doc_id") % 5 =!= 4).select("gh").distinct()
    val p = g.filter(col("doc_id") % 5 === 4)
      .join(corpus, Seq("gh"), "leftsemi")
      .select(col("doc_id"), col("i"))
    islandsToSpans(p).orderBy("doc_id", "span_start")
  }

  /** Per-source duplicated-substring MASS — the monitor that turns span
    * detection into a curation decision (which source ships boilerplate,
    * how many chars a substring-cut pass would remove). Span char ranges
    * can OVERLAP (islands are disjoint in start positions, not in
    * coverage), so duplicated chars count as the interval-union length:
    * each span contributes its length minus the running-max previous end
    * overlap — one lag-style window over the (already tiny) span set,
    * then a left join back to documents so untouched docs keep their
    * denominators. Exact integer char counts; only dup_frac divides. */
  val qDedupSubstringMass = Q(
    "q_dedup_substring_mass",
    s"""$substringSpansDuck,
      |u AS (
      |  SELECT doc_id, span_start, span_start + span_len - 1 AS e,
      |    max(span_start + span_len - 1) OVER (PARTITION BY doc_id
      |      ORDER BY span_start
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
      |  FROM spans),
      |cov AS (
      |  SELECT doc_id,
      |    CASE WHEN prev_e IS NULL OR prev_e < span_start
      |           THEN e - span_start + 1
      |         WHEN e > prev_e THEN e - prev_e
      |         ELSE 0 END AS c
      |  FROM u),
      |perdoc AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_chars
      |  FROM cov GROUP BY doc_id)
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(p.doc_id) AS BIGINT) AS docs_hit,
      |  CAST(COALESCE(SUM(p.dup_chars), 0) AS BIGINT) AS dup_chars,
      |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
      |  round(COALESCE(SUM(p.dup_chars), 0) * 1.0 / SUM(d.n_chars), 6)
      |    AS dup_frac
      |FROM documents d LEFT JOIN perdoc p USING (doc_id)
      |GROUP BY d.source ORDER BY d.source""".stripMargin
  ) { (spark, dir) =>
    val spans = substringSpans(spark, dir)
    val prevW = Window.partitionBy("doc_id").orderBy("span_start")
      .rowsBetween(Window.unboundedPreceding, -1)
    val perdoc = spans
      .withColumn("e", col("span_start") + col("span_len") - 1)
      .withColumn("prev_e", max("e").over(prevW))
      .select(col("doc_id"),
        when(col("prev_e").isNull || col("prev_e") < col("span_start"),
          col("e") - col("span_start") + 1)
          .when(col("e") > col("prev_e"), col("e") - col("prev_e"))
          .otherwise(lit(0L)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("bigint").as("dup_chars"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(perdoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("dup_chars")).as("docs_hit"),
        coalesce(sum("dup_chars"), lit(0L)).cast("bigint").as("dup_chars"),
        sum("n_chars").cast("bigint").as("total_chars"),
        round(coalesce(sum("dup_chars"), lit(0L)).cast("double")
          / sum("n_chars").cast("double"), 6).as("dup_frac"))
      .orderBy("source")
  }

  /** Regex (BPE-ish) tokenization: alpha runs and digit runs as separate
    * tokens, counted per language — the cheap token-budget estimator a
    * training pipeline runs before the real tokenizer. */
  val qTokenBpe = Q(
    "q_token_bpe",
    """SELECT lang,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS n_re_tokens,
      |  CAST(MIN(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS INT) AS min_doc_tokens,
      |  CAST(MAX(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS INT) AS max_doc_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val n = size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(sum(n).as("n_re_tokens"), min(n).as("min_doc_tokens"),
        max(n).as("max_doc_tokens"))
      .orderBy("lang")
  }

  /** One BPE merge iteration (Sennrich et al. 2016): the per-language
    * top-8 adjacent-character pair candidates, weighted by word
    * frequency — the inner step a byte-pair-encoding tokenizer trainer
    * repeats to build its vocabulary. The production shape: aggregate
    * the corpus to a (lang, word, freq) DICTIONARY first (one shuffle
    * whose map-side combine collapses the token stream), then expand
    * pairs over distinct words only — pair-counting cost is dictionary
    * mass, not corpus mass, exactly how real BPE trainers avoid
    * re-scanning text per merge. The (lang, pair) aggregate has a tiny
    * key space (≤ alphabet², so partial aggregation collapses it
    * map-side) and the rank window runs over that tiny frame with a
    * per-group limit. All counts are exact integers. */
  val qTokenPairMerge = Q(
    "q_token_pair_merge",
    """WITH words AS (
      |  SELECT lang, t AS w, COUNT(*) AS freq
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE len(t) >= 2 GROUP BY 1, 2),
      |pairs AS (
      |  SELECT lang, substr(w, CAST(i AS INT), 2) AS pair,
      |    CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM (SELECT lang, w, freq,
      |          unnest(generate_series(1, len(w) - 1)) AS i FROM words)
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT lang, pair, cnt,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, pair) AS INT) AS rnk
      |  FROM pairs)
      |SELECT lang, pair, cnt, rnk FROM ranked
      |WHERE rnk <= 8 ORDER BY lang, rnk""".stripMargin
  ) { (spark, dir) =>
    val pairs = bpePairCounts(spark, dir)
    val rw = Window.partitionBy("lang").orderBy(desc("cnt"), asc("pair"))
    pairs.withColumn("rn", row_number().over(rw))
      .filter(col("rn") <= 8) // raw rank so WindowGroupLimit can push
      .select(col("lang"), col("pair"), col("cnt"), col("rn").cast("int").as("rnk"))
      .orderBy("lang", "rnk")
  }

  /** (lang, w, freq) word dictionary and (lang, pair, cnt) adjacent-char
    * pair counts — the shared derivation of the BPE counting, candidate,
    * and apply rows. */
  private def bpeWordDict(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
      .persistScratch() // pair counts + the apply join share one derivation

  private def bpePairCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    bpeWordDict(spark, dir)
      .select(col("lang"), col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("lang"), expr("substring(w, i, 2)").as("pair"), col("freq"))
      .groupBy("lang", "pair").agg(sum("freq").as("cnt"))

  /** APPLY the winning BPE merge (Sennrich et al. 2016, the step after
    * q_token_pair_merge's candidate counting): each language's top-1
    * pair merges into one symbol across the word DICTIONARY, reporting
    * the merge count and the average tokens-per-word before/after — the
    * compression readout that decides whether training continues.
    * Occurrences count by LENGTH ARITHMETIC: replace(w, pair, '')
    * removes 2 chars per non-overlapping left-to-right occurrence (the
    * exact BPE application order, and the same replace semantics on
    * both engines — 'aaa' merges once under pair 'aa'), so
    * occ = (len - len(replaced)) div 2 with no sentinel character that
    * could collide with corpus text. Cost is dictionary mass, not
    * corpus mass — the dictionary expansion trick real BPE trainers use
    * per iteration — and the top-1 table (one row per language)
    * broadcasts. All counts are exact integers; only the final
    * per-language averages divide. */
  val qTokenBpeApply = Q(
    "q_token_bpe_apply",
    """WITH words AS (
      |  SELECT lang, t AS w, COUNT(*) AS freq
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE len(t) >= 2 GROUP BY 1, 2),
      |pairs AS (
      |  SELECT lang, substr(w, CAST(i AS INT), 2) AS pair,
      |    CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM (SELECT lang, w, freq,
      |          unnest(generate_series(1, len(w) - 1)) AS i FROM words)
      |  GROUP BY 1, 2),
      |top1 AS (
      |  SELECT lang, pair FROM (
      |    SELECT lang, pair,
      |      CAST(row_number() OVER (PARTITION BY lang
      |        ORDER BY cnt DESC, pair) AS INT) AS rnk
      |    FROM pairs) WHERE rnk = 1),
      |ap AS (
      |  SELECT w.lang, t.pair, w.freq, len(w.w) AS lw,
      |    (len(w.w) - len(replace(w.w, t.pair, ''))) // 2 AS occ
      |  FROM words w JOIN top1 t USING (lang))
      |SELECT lang, pair,
      |  CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(freq) AS BIGINT) AS total_freq,
      |  CAST(SUM(freq * occ) AS BIGINT) AS n_merges,
      |  round(SUM(freq * lw) * 1.0 / SUM(freq), 6) AS avg_tok_before,
      |  round(SUM(freq * (lw - occ)) * 1.0 / SUM(freq), 6) AS avg_tok_after
      |FROM ap GROUP BY lang, pair
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val rw = Window.partitionBy("lang").orderBy(desc("cnt"), asc("pair"))
    val top1 = bpePairCounts(spark, dir)
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("lang"), col("pair"))
    bpeWordDict(spark, dir)
      .join(broadcast(top1), "lang")
      .select(col("lang"), col("pair"), col("freq"),
        length(col("w")).cast("long").as("lw"),
        expr("CAST((length(w) - length(replace(w, pair, ''))) div 2 AS BIGINT)")
          .as("occ"))
      .groupBy("lang", "pair")
      .agg(count(lit(1)).as("n_words"),
        sum("freq").cast("bigint").as("total_freq"),
        sum(col("freq") * col("occ")).cast("bigint").as("n_merges"),
        round(sum(col("freq") * col("lw")).cast("double")
          / sum("freq").cast("double"), 6).as("avg_tok_before"),
        round(sum(col("freq") * (col("lw") - col("occ"))).cast("double")
          / sum("freq").cast("double"), 6).as("avg_tok_after"))
      .orderBy("lang")
  }

  /** Number of merge rounds the BPE trainer runs, and the fresh one-
    * code-point symbol each round's winning pair merges into: Unicode
    * private-use U+E000+i. The dictionary EXCLUDES words already
    * containing a reserved code point (none exist in real corpora; the
    * filter makes the rule explicit and identical cross-engine), so a
    * merged symbol can only ever originate from its own round's replace
    * — the rewrite is invertible and distinct words stay distinct. */
  private val BpeMerges = 4
  private val bpeReserved = "[-]"

  /** Multi-merge BPE TRAINER (Sennrich et al. 2016, the full loop):
    * [[qTokenPairMerge]]'s count and [[qTokenBpeApply]]'s apply iterated
    * k = 4 times per language over the SHRINKING dictionary. Each round
    * counts adjacent-symbol pairs over the current dictionary, merges
    * the per-language winner (cnt DESC, pair ASC by code point — the
    * same total order both engines use) into a fresh private-use symbol
    * via left-to-right non-overlapping replace, and emits the merge
    * table row: the winning pair (which from round 2 can itself contain
    * earlier merge symbols), the exact merge count (freq-weighted length
    * shrink — each merge removes exactly one code point), and the
    * average tokens-per-word trajectory (a word's token count IS its
    * code-point length, since every symbol is one code point).
    * InvariantSpec asserts the trajectory is non-increasing per round.
    *
    * Scale: each round's cost is dictionary mass, not corpus mass — the
    * corpus is scanned ONCE into the (lang, word, freq) dictionary and
    * never again (the real BPE trainer discipline); the per-round pair
    * aggregate collapses map-side into the ≤ symbols² key space and the
    * one-row-per-language winner broadcasts back. The k-round loop is k
    * dictionary-linear passes with no corpus re-shuffle. */
  val qTokenBpeTrain = Q(
    "q_token_bpe_train", {
      val d0 =
        s"""d0 AS (
           |  SELECT lang, t AS w, COUNT(*) AS freq
           |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
           |  WHERE len(t) >= 2 AND NOT regexp_matches(t, '$bpeReserved')
           |  GROUP BY 1, 2)""".stripMargin
      val iters = (1 to BpeMerges).map { i =>
        val prev = s"d${i - 1}"
        val code = 0xE000 + (i - 1)
        s"""p$i AS (
           |  SELECT lang, substr(w, CAST(i AS INT), 2) AS pair,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT lang, w, freq,
           |          unnest(generate_series(1, len(w) - 1)) AS i
           |        FROM $prev WHERE len(w) >= 2)
           |  GROUP BY 1, 2),
           |t$i AS (
           |  SELECT lang, pair FROM (
           |    SELECT lang, pair,
           |      CAST(row_number() OVER (PARTITION BY lang
           |        ORDER BY cnt DESC, pair) AS INT) AS rnk
           |    FROM p$i) WHERE rnk = 1),
           |a$i AS (
           |  SELECT d.lang, t.pair, d.freq, len(d.w) AS lw,
           |    replace(d.w, t.pair, chr($code)) AS w2
           |  FROM $prev d JOIN t$i t USING (lang)),
           |s$i AS (
           |  SELECT lang, pair, CAST($i AS INT) AS it,
           |    CAST(SUM(freq * (lw - len(w2))) AS BIGINT) AS n_merges,
           |    round(SUM(freq * len(w2)) * 1.0 / SUM(freq), 6) AS avg_tok
           |  FROM a$i GROUP BY 1, 2),
           |d$i AS (SELECT lang, w2 AS w, freq FROM a$i)""".stripMargin
      }
      (d0 +: iters).mkString("WITH ", ",\n", "\n") +
        s"""SELECT lang, it, pair, n_merges, avg_tok
           |FROM (${(1 to BpeMerges).map(i => s"SELECT * FROM s$i")
                     .mkString(" UNION ALL ")})
           |ORDER BY lang, it""".stripMargin
    }
  ) { (spark, dir) =>
    var dict = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").rlike(bpeReserved))
      .groupBy("lang", "w").agg(count(lit(1)).as("freq"))
      .persistScratch() // round 1 reads it twice (pair count + apply)
    val rw = Window.partitionBy("lang").orderBy(desc("cnt"), asc("pair"))
    val outs = (1 to BpeMerges).map { i =>
      val sym = (0xE000 + (i - 1)).toChar.toString
      val pairs = dict.filter(length(col("w")) >= 2)
        .select(col("lang"), col("w"), col("freq"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(col("lang"), expr("substring(w, i, 2)").as("pair"), col("freq"))
        .groupBy("lang", "pair").agg(sum("freq").as("cnt"))
      val top1 = pairs.withColumn("rn", row_number().over(rw))
        .filter(col("rn") === 1).select(col("lang"), col("pair"))
      val applied = dict.join(broadcast(top1), "lang")
        .select(col("lang"), col("pair"), col("freq"),
          length(col("w")).cast("long").as("lw"),
          expr(s"replace(w, pair, '$sym')").as("w2"))
      val stat = applied
        .groupBy("lang", "pair")
        .agg(sum(col("freq") * (col("lw") - length(col("w2")).cast("long")))
            .cast("bigint").as("n_merges"),
          round(sum(col("freq") * length(col("w2")).cast("long")).cast("double")
            / sum("freq").cast("double"), 6).as("avg_tok"))
        .withColumn("it", lit(i))
      dict = applied.select(col("lang"), col("w2").as("w"), col("freq"))
        .persistScratch() // next round reads it twice
      stat
    }
    outs.reduce(_ unionByName _)
      .select(col("lang"), col("it"), col("pair"), col("n_merges"),
        col("avg_tok"))
      .orderBy("lang", "it")
  }

  /** Tokenizer FERTILITY per language — subword tokens emitted per
    * whitespace word, the standard tokenizer-evaluation metric (a
    * fertility far above ~1.3 for a language means the vocabulary
    * under-serves it and its documents pay more sequence length per
    * word). The subword stand-in is a deterministic greedy 4-char
    * chunker: a word of length L costs ceil(L/4) = (L+3) div 4 tokens —
    * exact integer arithmetic on both engines, so the per-language sums
    * hash-match and only the final ratio is a (deterministic) double
    * division. One corpus scan, per-row array arithmetic, one tiny
    * aggregate — the cheapest possible shape. */
  val qTokenFertility = Q(
    "q_token_fertility",
    """SELECT lang,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
      |  CAST(SUM(list_sum(list_transform(string_split(text, ' '),
      |    w -> (length(w) + 3) // 4))) AS BIGINT) AS n_subwords,
      |  round(CAST(SUM(list_sum(list_transform(string_split(text, ' '),
      |      w -> (length(w) + 3) // 4))) AS DOUBLE)
      |    / SUM(len(string_split(text, ' '))), 6) AS fertility
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val nw = size(split(col("text"), " "))
    // `div` yields BIGINT, so the fold's zero must be BIGINT too
    val nsw = expr(
      "aggregate(transform(split(text, ' '), w -> (length(w) + 3) div 4), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)")
    Tables.documents(spark, dir)
      .select(col("lang"), nw.as("nw"), nsw.as("nsw"))
      .groupBy("lang")
      .agg(sum("nw").as("n_words"), sum("nsw").as("n_subwords"),
        round(sum("nsw").cast("double") / sum("nw"), 6).as("fertility"))
      .orderBy("lang")
  }

  /** Multimodal-column metadata: treat the text as an opaque binary
    * payload (stand-in for image/audio bytes — see operators.Multimodal
    * for the typed decode plumbing) and extract byte length + content
    * digest + a deterministic stub feature, per source. */
  val qMultimodalMeta = Q(
    "q_multimodal_meta",
    """SELECT source,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  COUNT(DISTINCT left(md5(text), 16)) AS n_digests,
      |  CAST(SUM(n_chars % 97) AS BIGINT) AS stub_feature_sum
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("source"),
        length(col("text").cast("binary")).as("blob_len"),
        substring(md5(col("text")), 1, 16).as("digest16"),
        (col("n_chars") % 97).as("stub_feature"))
      .groupBy("source")
      .agg(sum(col("blob_len")).as("total_bytes"),
        countDistinct("digest16").as("n_digests"),
        sum(col("stub_feature")).as("stub_feature_sum"))
      .orderBy("source")
  }

  /** Multimodal frame sampling: treat each payload as a video whose frame
    * count comes from the content digest (byte 2 of md5 — the identical
    * formula decodeStub uses in operators.Multimodal), then compute how
    * many frames the every-5th-capped-at-20 sampler would pull:
    * min(cap, (n-1) div every + 1) == Multimodal.sampleFrameIndexes(n, 5,
    * 20).size (asserted exhaustively in MultimodalSpec). Exact ints —
    * deterministic cross-engine via hex-digit arithmetic. */
  val qMultimodalFrames = Q(
    "q_multimodal_frames",
    """WITH f AS (
      |  SELECT source,
      |    1 + (strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(text), 6, 1)) - 1) AS nf
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_videos,
      |  CAST(SUM(nf) AS BIGINT) AS total_frames,
      |  CAST(SUM(LEAST(20, (nf - 1) // 5 + 1)) AS BIGINT) AS total_sampled,
      |  CAST(MAX(nf) AS INT) AS max_frames
      |FROM f
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (spark, dir) =>
    val nf = (lit(1) +
      expr("CAST(conv(substring(md5(text), 5, 2), 16, 10) AS INT)")).as("nf")
    Tables.documents(spark, dir)
      .select(col("source"), nf)
      .withColumn("sampled", least(lit(20), expr("(nf - 1) div 5") + 1))
      .groupBy("source")
      .agg(count(lit(1)).as("n_videos"),
        sum("nf").as("total_frames"),
        sum("sampled").as("total_sampled"),
        max("nf").cast("int").as("max_frames"))
      .orderBy("source")
  }

  /** Token co-occurrence / PMI: which token pairs appear in the same
    * document far more often than chance — collocation extraction, the
    * corpus-statistics pass phrase-mining pipelines run. Inverted-index
    * shape: the only big join is the incidence self-join ON doc_id
    * (high-cardinality key), cost ∝ Σ per-doc pair counts — never a
    * vocab×vocab scan. Before the self-join the incidence list is
    * prefiltered to tokens with document frequency ≥ 5 — LOSSLESS, since
    * a pair surviving HAVING c_ab ≥ 5 needs both its tokens in ≥ 5 docs;
    * the filter removes exactly the long-tail vocabulary (hapax and
    * near-hapax tokens dominate any real corpus by Zipf) whose per-doc
    * pair fan-out would explode at 100 TB. Mirrored in the oracle SQL.
    * PMI = ln(c_ab·N / (c_a·c_b)); the ratio is exact
    * ints → one double division → ln; round6 absorbs the ≤1-ulp libm
    * difference between engines, and the ORDER BY uses the rounded value
    * so the top-10 cut is identical. */
  val qTextCooccur = Q(
    "q_text_cooccur",
    """WITH inc AS (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |  FROM documents),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |ca AS (SELECT t, COUNT(*) AS c FROM inc GROUP BY t),
      |incf AS (SELECT inc.doc_id, inc.t FROM inc JOIN ca ON inc.t = ca.t
      |         WHERE ca.c >= 5),
      |pairs AS (
      |  SELECT a.t AS ta, b.t AS tb, COUNT(*) AS c_ab
      |  FROM incf a JOIN incf b ON a.doc_id = b.doc_id AND a.t < b.t
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 5)
      |SELECT ta, tb, c_ab,
      |  round(ln((c_ab * n_docs) / (x.c * y.c)), 6) AS pmi
      |FROM pairs JOIN ca x ON x.t = ta JOIN ca y ON y.t = tb, n
      |ORDER BY pmi DESC, ta, tb
      |LIMIT 10""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val inc = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .persistScratch() // feeds the token counts + (filtered) both join sides
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    // vocab-sized; feeds the df>=5 prefilter AND the two final PMI joins
    val ca = inc.groupBy("t").agg(count(lit(1)).as("c")).persistScratch()
    val incf = inc.join(ca.filter(col("c") >= 5).select("t"), "t")
      .select("doc_id", "t")
    val pairs = incf.select(col("doc_id"), col("t").as("ta"))
      .join(incf.select(col("doc_id"), col("t").as("tb")), "doc_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    pairs
      .join(ca.select(col("t").as("ta"), col("c").as("c_a")), "ta")
      .join(ca.select(col("t").as("tb"), col("c").as("c_b")), "tb")
      .crossJoin(nDf)
      .select(col("ta"), col("tb"), col("c_ab"),
        round(log((col("c_ab") * col("n_docs")) / (col("c_a") * col("c_b"))), 6).as("pmi"))
      .orderBy(desc("pmi"), asc("ta"), asc("tb"))
      .limit(10)
  }

  /** Per-document TF-IDF top terms: the classic keyword extractor. TF is
    * an exact per-(doc, term) count, IDF = ln(N/df) from exact counts, and
    * the ranking key is the ROUNDED score (both engines) so the top-3 cut
    * can't flip on a sub-ulp libm difference. One explode + two aggregates
    * + a window — linear in corpus token count. */
  val qTextTfidf = Q(
    "q_text_tfidf",
    """WITH inc AS (
      |  SELECT doc_id, t, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY 1, 2),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |dfreq AS (SELECT t, COUNT(*) AS df FROM inc GROUP BY t)
      |SELECT doc_id, rk, t, score FROM (
      |  SELECT doc_id, i.t AS t,
      |    round(tf * ln(n_docs / df), 6) AS score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY round(tf * ln(n_docs / df), 6) DESC, i.t) AS INT) AS rk
      |  FROM inc i JOIN dfreq d ON i.t = d.t, n)
      |WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val inc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .persistScratch() // feeds the df aggregate AND the scored join
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = inc.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("t"))
    inc.join(dfreq, "t").crossJoin(nDf)
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "t", "score")
      .orderBy("doc_id", "rk")
  }

  /** Per-language top-k document selection by quality score — the
    * curation step that picks the best documents per stratum. Window
    * top-k with a doc_id tiebreak (rank is unique ⇒ deterministic). */
  val qDocTopkQuality = Q(
    "q_doc_topk_quality",
    """SELECT lang, rk, doc_id, n_tokens FROM (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS INT) AS rk
      |  FROM documents)
      |WHERE rk <= 3
      |ORDER BY lang, rk""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val nTok = size(split(col("text"), " "))
    val w = Window.partitionBy("lang").orderBy(desc("n_tokens"), asc("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("lang", "rk", "doc_id", "n_tokens")
      .orderBy("lang", "rk")
  }

  /** Gopher-style quality-rule FUNNEL with per-rule drop attribution
    * (Rae et al., "Scaling Language Models: Methods, Analysis & Insights
    * from Training Gopher", 2021, §A1.1 adapted to whitespace tokens):
    * five deterministic rules — word count in [50, 100000], mean word
    * length in [3, 10], ≥2 stopwords, top-word fraction ≤ 0.2, ≥80% of
    * words containing an alphabetic character — reported per language as
    * HOW MANY documents each rule fails plus the survivors. Per-rule
    * attribution (not just the kept set) is what a curation run actually
    * ships: it's how you notice one mis-tuned threshold deleting a
    * language. Every ratio test is integer cross-multiplication
    * (5·topc > nw, 5·nalpha < 4·nw, chars < 3·nw), so no float boundary
    * can flip cross-engine. Scale: one corpus scan computes four rules
    * per-row; the top-word rule is explode → count → max keyed on doc_id
    * (corpus-linear, the q_text_wordcount shuffle shape) — never a
    * per-row O(len²) array self-scan, which would blow up on a single
    * 100k-token document. */
  val qDocQualityFunnel = Q(
    "q_doc_quality_funnel",
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws
       |  FROM documents),
       |base AS (SELECT doc_id, lang, n_chars, len(ws) AS nw,
       |    len(list_filter(ws, x -> x IN ($stopsSql))) AS nstop,
       |    len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS nalpha
       |  FROM t),
       |topw AS (SELECT doc_id, MAX(c) AS topc FROM (
       |    SELECT doc_id, w, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w)
       |  GROUP BY doc_id),
       |f AS (SELECT b.lang,
       |    CASE WHEN b.nw < 50 OR b.nw > 100000 THEN 1 ELSE 0 END AS f_wc,
       |    CASE WHEN b.n_chars - (b.nw - 1) < 3 * b.nw
       |           OR b.n_chars - (b.nw - 1) > 10 * b.nw THEN 1 ELSE 0 END AS f_mwl,
       |    CASE WHEN b.nstop < 2 THEN 1 ELSE 0 END AS f_stop,
       |    CASE WHEN 5 * w.topc > b.nw THEN 1 ELSE 0 END AS f_rep,
       |    CASE WHEN 5 * b.nalpha < 4 * b.nw THEN 1 ELSE 0 END AS f_alpha
       |  FROM base b JOIN topw w ON b.doc_id = w.doc_id)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(f_wc) AS BIGINT) AS fail_wordcount,
       |  CAST(SUM(f_mwl) AS BIGINT) AS fail_meanwordlen,
       |  CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
       |  CAST(SUM(f_rep) AS BIGINT) AS fail_repetition,
       |  CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha,
       |  CAST(SUM(CASE WHEN f_wc = 0 AND f_mwl = 0 AND f_stop = 0
       |                 AND f_rep = 0 AND f_alpha = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val tk = split(col("text"), " ")
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      size(tk).cast("bigint").as("nw"),
      size(filter(tk, t => t.isin(stops: _*))).cast("bigint").as("nstop"),
      size(filter(tk, t => t.rlike("[a-zA-Z]"))).cast("bigint").as("nalpha"))
    val topw = docs
      .select(col("doc_id"), explode(tk).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("topc"))
    val fWc = when(col("nw") < 50 || col("nw") > 100000, 1L).otherwise(0L)
    val fMwl = when(col("n_chars") - (col("nw") - 1) < lit(3) * col("nw") ||
      col("n_chars") - (col("nw") - 1) > lit(10) * col("nw"), 1L).otherwise(0L)
    val fStop = when(col("nstop") < 2, 1L).otherwise(0L)
    val fRep = when(lit(5) * col("topc") > col("nw"), 1L).otherwise(0L)
    val fAlpha = when(lit(5) * col("nalpha") < lit(4) * col("nw"), 1L)
      .otherwise(0L)
    base.join(topw, Seq("doc_id"))
      .select(col("lang"), fWc.as("f_wc"), fMwl.as("f_mwl"),
        fStop.as("f_stop"), fRep.as("f_rep"), fAlpha.as("f_alpha"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("f_wc").cast("bigint").as("fail_wordcount"),
        sum("f_mwl").cast("bigint").as("fail_meanwordlen"),
        sum("f_stop").cast("bigint").as("fail_stopwords"),
        sum("f_rep").cast("bigint").as("fail_repetition"),
        sum("f_alpha").cast("bigint").as("fail_alpha"),
        sum(when(col("f_wc") === 0 && col("f_mwl") === 0 &&
          col("f_stop") === 0 && col("f_rep") === 0 && col("f_alpha") === 0,
          1L).otherwise(0L)).cast("bigint").as("n_kept"))
      .orderBy("lang")
  }

  /** Composite training-data curation pipeline as ONE dataflow: exact
    * dedup (keep min doc_id per sha-256) → quality gate (token count band
    * + stopword ratio cap) → per-(lang, source) corpus stats. This is the
    * shape a real 100 TB pre-training filter runs: one scan, one
    * hash-groupBy for the dedup key, one semi-join, one final aggregate. */
  val qPipelineFilter = Q(
    "q_pipeline_filter",
    s"""WITH survivors AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
       |kept AS (
       |  SELECT d.lang, d.source,
       |    len(string_split(d.text, ' ')) AS n_tokens
       |  FROM documents d JOIN survivors s ON d.doc_id = s.doc_id
       |  WHERE len(string_split(d.text, ' ')) BETWEEN 20 AND 100
       |    AND CAST(len(list_filter(string_split(d.text, ' '), t -> t IN ($stopsSql))) AS DOUBLE)
       |        / len(string_split(d.text, ' ')) <= 0.5)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |FROM kept
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val tk = split(col("text"), " ")
    val nTok = size(tk)
    val nStop = size(filter(tk, t => t.isin(stops: _*)))
    val survivors = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(nTok.between(20, 100) &&
        nStop.cast("double") / nTok <= 0.5)
      .select(col("lang"), col("source"), nTok.as("n_tokens"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"))
      .orderBy("lang", "source")
  }

  /** END-TO-END curation pipeline, graded as ONE composition: Gopher
    * quality funnel ([[qDocQualityFunnel]]'s 5 keep-rules) → exact dedup
    * (min doc_id per sha-256) → near-dup keep-best (3-gram-shingle
    * Jaccard ≥ 1/2 over the SURVIVING corpus, df-capped per
    * [[shingleDfCap]]; a doc is dropped iff some verified near-dup
    * neighbor beats it on (n_chars DESC, doc_id ASC)) → decontaminate
    * (drop the src0 eval split, then any doc sharing a 5-gram with it —
    * the eval shingle set comes from the ORIGINAL corpus: benchmarks are
    * external to the filter chain) → largest-remainder million-token mix
    * budget over the survivors → greedy 2048-token packing. The output
    * row per language carries each stage's survivor count plus the final
    * token mass, budget allocation, and packed-bin count, so a stage
    * consuming its predecessor's EXCLUDED rows — the one bug class the
    * per-stage rows (q_doc_quality_funnel, q_pipeline_filter,
    * q_dedup_ngram, q_decontaminate, q_doc_mix_budget, q_doc_pack)
    * cannot see — breaks the cross-engine hash.
    *
    * Scale: the corpus is scanned once into the tokenized frame; every
    * stage is the same shape its standalone row ships (inverted-index
    * shingle joins keyed on the high-cardinality shingle, hash-groupBy
    * dedup, per-lang windows on the lang partitioning); each stage's
    * survivor frame persists because two branches read it (the next
    * stage and its count). */
  val qPipelineE2e = Q(
    "q_pipeline_e2e",
    s"""WITH t AS (
       |  SELECT doc_id, lang, source, n_chars, text,
       |    string_split(text, ' ') AS ws,
       |    len(string_split(text, ' ')) AS nw
       |  FROM documents),
       |base AS (SELECT t.*,
       |    len(list_filter(ws, x -> x IN ($stopsSql))) AS nstop,
       |    len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS nalpha
       |  FROM t),
       |topw AS (SELECT doc_id, MAX(c) AS topc FROM (
       |    SELECT doc_id, w, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY doc_id, w)
       |  GROUP BY doc_id),
       |s1 AS (SELECT b.doc_id, b.lang, b.source, b.n_chars, b.text, b.ws, b.nw
       |  FROM base b JOIN topw w ON b.doc_id = w.doc_id
       |  WHERE b.nw BETWEEN 50 AND 100000
       |    AND b.n_chars - (b.nw - 1) BETWEEN 3 * b.nw AND 10 * b.nw
       |    AND b.nstop >= 2 AND 5 * w.topc <= b.nw
       |    AND 5 * b.nalpha >= 4 * b.nw),
       |s2 AS (SELECT s.* FROM s1 s JOIN (
       |    SELECT min(doc_id) AS doc_id FROM s1 GROUP BY sha256(text)) k
       |  ON s.doc_id = k.doc_id),
       |sh3 AS (SELECT doc_id, lang,
       |    unnest(list_distinct(list_transform(range(1, CAST(nw AS INT) - 1),
       |      i -> array_to_string(ws[i:i+2], ' ')))) AS s
       |  FROM s2),
       |hot AS (SELECT lang, s FROM sh3 GROUP BY lang, s
       |        HAVING COUNT(*) > $shingleDfCap),
       |keep3 AS (SELECT i.doc_id, i.lang, i.s FROM sh3 i
       |  ANTI JOIN hot h ON i.lang = h.lang AND i.s = h.s),
       |sz3 AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS sz
       |        FROM keep3 GROUP BY doc_id),
       |nd AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(COUNT(*) AS INT) AS inter
       |  FROM keep3 a JOIN keep3 b
       |    ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |prs AS (SELECT a_id, b_id FROM nd
       |  JOIN sz3 sa ON sa.doc_id = a_id JOIN sz3 sb ON sb.doc_id = b_id
       |  WHERE 3 * inter >= sa.sz + sb.sz),
       |lose AS (SELECT CASE WHEN da.n_chars > db.n_chars
       |      OR (da.n_chars = db.n_chars AND da.doc_id < db.doc_id)
       |    THEN b_id ELSE a_id END AS doc_id
       |  FROM prs JOIN s2 da ON da.doc_id = a_id JOIN s2 db ON db.doc_id = b_id),
       |s3 AS (SELECT * FROM s2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM lose)),
       |eval5 AS (SELECT DISTINCT
       |    unnest(list_transform(range(1, CAST(nw AS INT) - 3),
       |      i -> array_to_string(ws[i:i+4], ' '))) AS s
       |  FROM t WHERE source = 'src0'),
       |contam AS (SELECT DISTINCT d.doc_id
       |  FROM (SELECT doc_id,
       |      unnest(list_distinct(list_transform(range(1, CAST(nw AS INT) - 3),
       |        i -> array_to_string(ws[i:i+4], ' ')))) AS s
       |    FROM s3 WHERE source <> 'src0') d
       |  JOIN eval5 e USING (s)),
       |s4 AS (SELECT * FROM s3 WHERE source <> 'src0'
       |  AND doc_id NOT IN (SELECT doc_id FROM contam)),
       |tok AS (SELECT lang, CAST(SUM(nw) AS BIGINT) AS toks
       |        FROM s4 GROUP BY lang),
       |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM tok),
       |alc AS (
       |  SELECT lang, CAST(floor_alloc
       |      + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |  FROM (SELECT lang, floor_alloc,
       |      CAST(row_number() OVER (ORDER BY rem DESC, lang) AS INT) AS rk,
       |      CAST(1000000 - SUM(floor_alloc) OVER () AS BIGINT) AS leftover
       |    FROM (SELECT lang, toks,
       |        CAST((toks * 1000000) // total AS BIGINT) AS floor_alloc,
       |        CAST((toks * 1000000) % total AS BIGINT) AS rem
       |      FROM tok, tot))),
       |packed AS (
       |  SELECT lang, CAST(COUNT(DISTINCT cum // 2048) AS INT) AS n_bins
       |  FROM (SELECT lang,
       |      CAST(coalesce(SUM(nw) OVER (PARTITION BY lang ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |        AS cum
       |    FROM s4) GROUP BY lang),
       |c1 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_funnel
       |       FROM s1 GROUP BY lang),
       |c2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_exact
       |       FROM s2 GROUP BY lang),
       |c3 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_neardup
       |       FROM s3 GROUP BY lang),
       |c4 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_clean
       |       FROM s4 GROUP BY lang)
       |SELECT c1.lang, c1.n_funnel,
       |  CAST(coalesce(c2.n_exact, 0) AS BIGINT) AS n_exact,
       |  CAST(coalesce(c3.n_neardup, 0) AS BIGINT) AS n_neardup,
       |  CAST(coalesce(c4.n_clean, 0) AS BIGINT) AS n_clean,
       |  CAST(coalesce(tok.toks, 0) AS BIGINT) AS toks,
       |  CAST(coalesce(alc.alloc, 0) AS BIGINT) AS alloc,
       |  CAST(coalesce(packed.n_bins, 0) AS INT) AS n_bins
       |FROM c1 LEFT JOIN c2 USING (lang) LEFT JOIN c3 USING (lang)
       |  LEFT JOIN c4 USING (lang) LEFT JOIN tok USING (lang)
       |  LEFT JOIN alc USING (lang) LEFT JOIN packed USING (lang)
       |ORDER BY c1.lang""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val tkC = split(col("text"), " ")
    val t = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text"), tkC.as("ws"),
      size(tkC).cast("bigint").as("nw"))
    val base = t
      .withColumn("nstop",
        size(filter(col("ws"), x => x.isin(stops: _*))).cast("bigint"))
      .withColumn("nalpha",
        size(filter(col("ws"), x => x.rlike("[a-zA-Z]"))).cast("bigint"))
    val topw = t.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("topc"))
    val s1 = base.join(topw, Seq("doc_id"))
      .filter(col("nw").between(50, 100000) &&
        (col("n_chars") - (col("nw") - 1) >= lit(3) * col("nw")) &&
        (col("n_chars") - (col("nw") - 1) <= lit(10) * col("nw")) &&
        col("nstop") >= 2 &&
        lit(5) * col("topc") <= col("nw") &&
        lit(5) * col("nalpha") >= lit(4) * col("nw"))
      .select("doc_id", "lang", "source", "n_chars", "text", "ws", "nw")
      .persistScratch() // exact-dedup key groupBy + semi-join + c1
    val s2 = s1.join(
        s1.groupBy(sha2(col("text"), 256).as("h"))
          .agg(min("doc_id").as("doc_id")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .persistScratch() // shingle pass + keep-best lookups + c2
    // array-local shingling (the Shingles discipline): the per-doc
    // distinct set explodes once, straight into the (lang, s) df window
    val inc = s2
      .select(col("doc_id"), col("lang"),
        explode_outer(graft.functions.Shingles.distinctSet(col("ws"), 3)).as("s"))
      .filter(col("s").isNotNull) // outer explode: the Shingles discipline
      .withColumn("df", count(lit(1)).over(Window.partitionBy("lang", "s")))
      .filter(col("df") <= shingleDfCap)
      .drop("df")
      .persistScratch() // both self-join sides + the size aggregate
    val sz = inc.groupBy("doc_id").agg(count(lit(1)).cast("int").as("sz"))
    val inter = inc.select(col("doc_id").as("a_id"), col("lang"), col("s"))
      .join(inc.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("s").as("b_s")),
        col("lang") === col("b_lang") && col("s") === col("b_s") &&
          col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).cast("int").as("inter"))
    val prs = inter
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .filter(col("inter") * 3 >= col("a_sz") + col("b_sz"))
      .select("a_id", "b_id")
    val lose = prs
      .join(s2.select(col("doc_id").as("a_id"), col("n_chars").as("a_ch")), "a_id")
      .join(s2.select(col("doc_id").as("b_id"), col("n_chars").as("b_ch")), "b_id")
      .select(when(col("a_ch") > col("b_ch") ||
          (col("a_ch") === col("b_ch") && col("a_id") < col("b_id")),
          col("b_id")).otherwise(col("a_id")).as("doc_id"))
      .distinct()
    val s3 = s2.join(lose, Seq("doc_id"), "left_anti")
      .persistScratch() // 5-gram pass + c3
    // 5-gram passes, array-local on both sides: per-doc distinct sets
    // explode once, so the only exchanges are the shingle-keyed distinct
    // and the shingle equi-join
    def gram5(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        explode_outer(graft.functions.Shingles.distinctSet(col("ws"), 5)).as("s"))
      .filter(col("s").isNotNull) // outer explode: the Shingles discipline
    val eval5 = gram5(t.filter(col("source") === "src0"))
      .select("s").distinct()
    val contam = gram5(s3.filter(col("source") =!= "src0"))
      .join(eval5, "s")
      .select("doc_id").distinct()
    val s4 = s3.filter(col("source") =!= "src0")
      .join(contam, Seq("doc_id"), "left_anti")
      .persistScratch() // tok + pack + c4
    val tok = s4.groupBy("lang").agg(sum("nw").as("toks"))
    val wr = Window.orderBy(desc("rem"), asc("lang"))
    val wAll = Window.partitionBy(lit(1))
    val alc = tok.crossJoin(tok.agg(sum("toks").as("total")))
      .select(col("lang"),
        expr("(toks * 1000000) div total").as("floor_alloc"),
        expr("(toks * 1000000) % total").as("rem"))
      .select(col("lang"), col("floor_alloc"),
        row_number().over(wr).as("rk"),
        (lit(1000000L) - sum("floor_alloc").over(wAll)).as("leftover"))
      .select(col("lang"),
        (col("floor_alloc") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
    val wp = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = s4.select(col("lang"), col("doc_id"), col("nw"))
      .withColumn("cum", coalesce(sum("nw").over(wp), lit(0L)))
      .select(col("lang"), expr("cum div 2048").as("bin"))
      .groupBy("lang").agg(countDistinct("bin").cast("int").as("n_bins"))
    val c1 = s1.groupBy("lang").agg(count(lit(1)).as("n_funnel"))
    val c2 = s2.groupBy("lang").agg(count(lit(1)).as("n_exact"))
    val c3 = s3.groupBy("lang").agg(count(lit(1)).as("n_neardup"))
    val c4 = s4.groupBy("lang").agg(count(lit(1)).as("n_clean"))
    c1.join(c2, Seq("lang"), "left").join(c3, Seq("lang"), "left")
      .join(c4, Seq("lang"), "left").join(tok, Seq("lang"), "left")
      .join(alc, Seq("lang"), "left").join(packed, Seq("lang"), "left")
      .select(col("lang"), col("n_funnel"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        coalesce(col("n_clean"), lit(0L)).as("n_clean"),
        coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("alloc"), lit(0L)).as("alloc"),
        coalesce(col("n_bins"), lit(0)).cast("int").as("n_bins"))
      .orderBy("lang")
  }


  /** Boolean keyword retrieval: rank documents by how many of the query
    * terms they contain (conjunctive-ish OR retrieval with a match-count
    * score), top-10 with doc_id tiebreak. The inverted-index shape: the
    * scan filters to the 3 query terms BEFORE any shuffle, so the
    * aggregate sees only matching incidences — at 100 TB this is a
    * posting-list scan, not a corpus scan. */
  val qTextSearch = Q(
    "q_text_search",
    """SELECT doc_id, CAST(n_terms AS INT) AS n_terms, lang FROM (
      |  SELECT i.doc_id, COUNT(DISTINCT i.t) AS n_terms, min(d.lang) AS lang
      |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      |        FROM documents) i
      |  JOIN documents d ON d.doc_id = i.doc_id
      |  WHERE i.t IN ('data', 'query', 'vector')
      |  GROUP BY i.doc_id)
      |ORDER BY n_terms DESC, doc_id
      |LIMIT 10""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val inc = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .filter(col("t").isin("data", "query", "vector"))
      .groupBy("doc_id")
      .agg(countDistinct("t").as("n_terms"))
    inc.join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("n_terms").cast("int").as("n_terms"), col("lang"))
      .orderBy(desc("n_terms"), asc("doc_id"))
      .limit(10)
  }


  /** Positional phrase search: documents containing the exact bigram
    * "data query" — keyword retrieval can't see adjacency, so this joins
    * the positional index with itself on (doc, pos+1). The posting-list
    * filter still runs at the scan; the self-join carries only the two
    * terms' postings. Counts per occurrence (not per doc) ride along. */
  val qTextPhrase = Q(
    "q_text_phrase",
    """WITH pos AS (
      |  SELECT doc_id, i AS p, ws[i] AS t
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |       LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i)),
      |hits AS (
      |  SELECT a.doc_id, COUNT(*) AS n_occur
      |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
      |  WHERE a.t = 'data' AND b.t = 'query'
      |  GROUP BY a.doc_id)
      |SELECT doc_id, CAST(n_occur AS INT) AS n_occur
      |FROM hits ORDER BY doc_id""".stripMargin
  ) { (spark, dir) =>
    val pos = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val a = pos.filter(col("t") === "data")
      .select(col("doc_id"), col("p"))
    val b = pos.filter(col("t") === "query")
      .select(col("doc_id").as("b_doc"), col("p").as("bp"))
    a.join(b, col("doc_id") === col("b_doc") && col("bp") === col("p") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_occur"))
      .orderBy("doc_id")
  }


  /** BM25 ranked retrieval over the same 3-term query as q_text_search —
    * the production lexical ranker (Okapi BM25 with the Lucene `+1` idf,
    * k1 = 1.2, b = 0.75). The posting-list shape: incidences are filtered
    * to the query terms BEFORE the tf shuffle, so at 100 TB only the
    * matched postings move; `dfreq` (|query| rows) and the corpus stats
    * (1 row) broadcast. Per-(doc, term) scores are quantized to integer
    * micro-units BEFORE the per-doc sum, so the cross-term addition is
    * exact integer arithmetic (order-free) and the ranking key cannot
    * drift on float summation order — the q_text_repetition discipline.
    * The only float steps (one ln, two divides) happen per posting row
    * with identical operand order in both engines. */
  val qTextBm25 = Q(
    "q_text_bm25",
    """WITH dl AS (
      |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t IN ('data', 'query', 'vector')
      |  GROUP BY 1, 2),
      |dfreq AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t),
      |scored AS (
      |  SELECT tf.doc_id, dl.lang,
      |    CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
      |      * 1000000) AS BIGINT) AS s_u
      |  FROM tf JOIN dfreq ON tf.t = dfreq.t
      |       JOIN dl ON dl.doc_id = tf.doc_id, stats)
      |SELECT doc_id, lang, CAST(SUM(s_u) AS BIGINT) / 1000000.0 AS bm25
      |FROM scored
      |GROUP BY doc_id, lang
      |ORDER BY CAST(SUM(s_u) AS BIGINT) DESC, doc_id
      |LIMIT 10""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val dl = docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("double").as("dl"))
      .persistScratch() // feeds the corpus stats AND the per-doc length join
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin("data", "query", "vector"))
      .groupBy("doc_id", "t").agg(count(lit(1)).cast("double").as("tf"))
      .persistScratch() // feeds dfreq AND the scored join
    val dfreq = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
    val sU = round(
      log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        * (col("tf") * lit(2.2))
        / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
        * lit(1000000)).cast("bigint")
    tf.join(broadcast(dfreq), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("lang"), sU.as("s_u"))
      .groupBy("doc_id", "lang")
      .agg(sum("s_u").cast("bigint").as("score_u"))
      .select(col("doc_id"), col("lang"),
        (col("score_u") / lit(1000000.0)).as("bm25"), col("score_u"))
      .orderBy(desc("score_u"), asc("doc_id"))
      .limit(10)
      .drop("score_u")
  }


  /** Multimodal resize planning: per payload, stub-typed image dims from
    * the content digest (hex pairs 7-8 / 9-10, the same digest-derived
    * metadata convention as decodeStub/q_multimodal_frames), then the
    * aspect-preserving fit into a 224x224 training tile: the longest side
    * maps to 224, the other floors proportionally — all integer
    * arithmetic, so the planned output dims are bit-identical
    * cross-engine. The real decode/resample lives behind the
    * Multimodal.decodeStub seam; THIS pass is the planning sweep a
    * preprocessing pipeline runs to budget compute before decoding. */
  val qMultimodalResize = Q(
    "q_multimodal_resize",
    """WITH d AS (
      |  SELECT source,
      |    64 + 4 * ((strpos('0123456789abcdef', substr(md5(text), 7, 1)) - 1) * 16
      |            + (strpos('0123456789abcdef', substr(md5(text), 8, 1)) - 1)) AS w,
      |    64 + 4 * ((strpos('0123456789abcdef', substr(md5(text), 9, 1)) - 1) * 16
      |            + (strpos('0123456789abcdef', substr(md5(text), 10, 1)) - 1)) AS h
      |  FROM documents),
      |r AS (
      |  SELECT source, w, h,
      |    (w * 224) // GREATEST(w, h) AS out_w,
      |    (h * 224) // GREATEST(w, h) AS out_h
      |  FROM d)
      |SELECT source, COUNT(*) AS n_images,
      |  CAST(SUM(w * h) AS BIGINT) AS in_pixels,
      |  CAST(SUM(out_w * out_h) AS BIGINT) AS out_pixels,
      |  CAST(MAX(GREATEST(out_w, out_h)) AS INT) AS max_side
      |FROM r GROUP BY source ORDER BY source""".stripMargin
  ) { (spark, dir) =>
    val dims = Tables.documents(spark, dir)
      .select(col("source"),
        (lit(64) + lit(4) * expr("CAST(conv(substring(md5(text), 7, 2), 16, 10) AS INT)")).as("w"),
        (lit(64) + lit(4) * expr("CAST(conv(substring(md5(text), 9, 2), 16, 10) AS INT)")).as("h"))
      .withColumn("out_w", expr("(w * 224) div greatest(w, h)"))
      .withColumn("out_h", expr("(h * 224) div greatest(w, h)"))
    dims.groupBy("source")
      .agg(count(lit(1)).as("n_images"),
        sum((col("w") * col("h")).cast("bigint")).as("in_pixels"),
        sum((col("out_w") * col("out_h")).cast("bigint")).as("out_pixels"),
        greatest(max("out_w"), max("out_h")).cast("int").as("max_side"))
      .orderBy("source")
  }


  /** Benchmark decontamination: flag training documents sharing any
    * 5-gram with the held-out split (source src0 stands in for the eval
    * benchmark) — the overlap sweep every pre-training pipeline runs
    * before the data ships. Inverted-index shape again: distinct
    * (doc, 5-gram) incidences once, the eval side reduced to a distinct
    * shingle set, one equi-join on the shingle — never doc x doc. Per
    * language: training docs, contaminated docs, worst overlap count. */
  val qDecontaminate = Q(
    "q_decontaminate",
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, source, lang,
      |    unnest(list_transform(range(1, len(ws) - 3),
      |      i -> array_to_string(ws[i:i+4], ' '))) AS s
      |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS ws
      |        FROM documents)),
      |e AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
      |h AS (SELECT sh.doc_id, sh.lang, COUNT(*) AS n_overlap
      |      FROM sh JOIN e USING (s) WHERE sh.source <> 'src0'
      |      GROUP BY sh.doc_id, sh.lang),
      |tr AS (SELECT lang, COUNT(*) AS n_train FROM documents
      |       WHERE source <> 'src0' GROUP BY lang)
      |SELECT tr.lang, tr.n_train,
      |  CAST(coalesce(c.n_contam, 0) AS BIGINT) AS n_contam,
      |  CAST(coalesce(c.max_overlap, 0) AS BIGINT) AS max_overlap
      |FROM tr LEFT JOIN (
      |  SELECT lang, COUNT(*) AS n_contam, MAX(n_overlap) AS max_overlap
      |  FROM h GROUP BY lang) c ON tr.lang = c.lang
      |ORDER BY tr.lang""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    // array-local 5-gram shingling: the per-doc distinct set explodes
    // once, so the only exchange left is the shingle equi-join
    val sh = docs
      .select(col("doc_id"), col("source"), col("lang"),
        split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("source"), col("lang"),
        explode_outer(graft.functions.Shingles.distinctSet(col("tk"), 5)).as("s"))
      .filter(col("s").isNotNull) // outer explode: the Shingles discipline
      .persistScratch() // eval shingle set + training incidences
    val e = sh.filter(col("source") === "src0").select("s").distinct()
    val h = sh.filter(col("source") =!= "src0")
      .join(e, "s")
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("n_overlap"))
    val tr = docs.filter(col("source") =!= "src0")
      .groupBy("lang").agg(count(lit(1)).as("n_train"))
    val c = h.groupBy("lang")
      .agg(count(lit(1)).as("n_contam"), max("n_overlap").as("max_overlap"))
    tr.join(c, Seq("lang"), "left")
      .select(col("lang"), col("n_train"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        coalesce(col("max_overlap"), lit(0L)).as("max_overlap"))
      .orderBy("lang")
  }

  /** Intra-document repetition ratio — the duplicate-3-gram fraction, a
    * standard pretraining junk filter (template/boilerplate text repeats
    * its own phrases; prose doesn't). Per doc: 1 − distinct/total shingles
    * in exact 1e-6 integer units (so the per-lang average is an exact
    * integer sum divided once — partition-order independent); docs with
    * < 3 tokens score 0. Pure per-row compute until the 5-row lang
    * rollup: zero shuffles of the corpus at any scale. */
  val qTextRepetition = Q(
    "q_text_repetition",
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(tk) >= 3 THEN
      |      CAST(round((1 - CAST(len(list_distinct(list_transform(
      |          range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))))
      |        AS DOUBLE) / (len(tk) - 2)) * 1000000) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS rep_u
      |  FROM t)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(rep_u) AS BIGINT) / 1000000.0 / COUNT(*) AS avg_repetition,
      |  CAST(SUM(CASE WHEN rep_u >= 100000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_flagged
      |FROM r GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .withColumn("rep_u", expr(
        """CASE WHEN size(tk) >= 3 THEN
          |  CAST(round((1 - CAST(size(array_distinct(transform(
          |      sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))))
          |    AS DOUBLE) / (size(tk) - 2)) * 1000000) AS BIGINT)
          |ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        (sum("rep_u").cast("bigint").cast("double") / 1000000.0 / count(lit(1)))
          .as("avg_repetition"),
        sum(when(col("rep_u") >= 100000, 1).otherwise(0)).cast("bigint")
          .as("n_flagged"))
      .orderBy("lang")
  }

  def all: Seq[Q] = Seq(qTextQuality, qLangId, qTextFingerprint,
    qDedupNgram, qDedupContainment, qDedupWinnow, qDedupSubstring,
    qDedupSubstringMass, qDedupSubstringInc,
    qTokenBpe, qTokenPairMerge, qTokenBpeApply, qTokenBpeTrain,
    qTokenFertility,
    qMultimodalMeta,
    qMultimodalFrames, qTextCooccur, qTextTfidf, qDocTopkQuality,
    qDocQualityFunnel, qPipelineFilter, qPipelineE2e,
    qTextSearch, qTextBm25, qTextPhrase,
    qMultimodalResize,
    qDecontaminate, qTextRepetition)
}
