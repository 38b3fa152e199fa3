package graft.operators

import graft.sources.Scratch.PersistSyntax
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Text-analysis + deduplication operators over the documents corpus
  * (SURVEY.md §2.7, the north star): tokenize/corpus stats, top-k terms,
  * exact hash dedup, Jaccard near-dup, plus language-ID scoring, quality
  * scoring, fingerprinting and n-gram shingle dedup.
  *
  * Scale notes: tokenization is per-row codegen (split); corpus stats are
  * partial→final aggregates. The pairwise dedup queries NEVER go all-pairs:
  * they block on (lang) and apply a lossless length-ratio prefilter (for
  * Jaccard ≥ t, |A|/|B| must lie in [t, 1/t] — anything outside cannot
  * reach the threshold), so the quadratic term is bounded per block. The
  * 100 TB path replaces the in-block pairing with MinHash-LSH banding
  * (functions.MinHash — same block-key seam, bands become the join key).
  */
object TextOps {

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Q29 — tokenize + corpus stats per language. */
  val q29 = Q(
    "q_text_tokens",
    """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT lang, COUNT(*) AS n_docs,
      |        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |        round(AVG(len(string_split(text, ' '))), 6) AS avg_tokens
      |      FROM documents GROUP BY 1),
      |d AS (SELECT lang, COUNT(DISTINCT tok) AS n_distinct FROM t GROUP BY 1)
      |SELECT s.lang AS lang, n_docs, n_tokens, avg_tokens, n_distinct
      |FROM s JOIN d ON s.lang = d.lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val stats = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks(col("text")))).as("n_tokens"),
      round(avg(size(toks(col("text")))), 6).as("avg_tokens"))
    val dist = docs
      .select(col("lang"), explode(toks(col("text"))).as("tok"))
      .groupBy("lang").agg(countDistinct("tok").as("n_distinct"))
    stats.join(dist, "lang").orderBy("lang")
  }

  /** Q30 — explode → global top-k terms (count DESC, token ASC tiebreak). */
  val q30 = Q(
    "q_text_wordcount",
    """SELECT tok, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY cnt DESC, tok
      |LIMIT 20""".stripMargin
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
      .limit(20)
  }

  /** Q31 — exact dedup by content hash: sha2-256 the text, keep the
    * min(doc_id) per hash, count survivors per language. The groupBy(hash)
    * shuffles one (hash, id) pair per row — never the text itself. */
  val q31 = Q(
    "q_dedup_hash",
    """SELECT lang, COUNT(*) AS n_survivors
      |FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY sha256(text))
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val keep = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keep, "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n_survivors"))
      .orderBy("lang")
  }

  /** Q32 — near-duplicate detection via token-set Jaccard, blocked by lang
    * with the lossless size-ratio prefilter (see object doc). J is a ratio
    * of small exact ints — deterministic on both engines. */
  val q32 = Q(
    "q_dedup_near",
    """WITH t AS (SELECT doc_id, lang,
      |             list_distinct(string_split(text, ' ')) AS tk,
      |             len(list_distinct(string_split(text, ' '))) AS sz
      |           FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.tk, b.tk))), 6) AS jaccard
      |FROM t a JOIN t b
      |  ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  AND a.sz * 10 >= b.sz * 9 AND b.sz * 10 >= a.sz * 9
      |WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.9
      |ORDER BY a_id, b_id""".stripMargin
  ) { (spark, dir) =>
    // Token sets are dictionary-encoded into bitmaps (TokenBits): per pair,
    // |A ∩ B| is popcount(a AND b) — exact, and ~100x cheaper than a string
    // hash-set intersection. |union| comes free as sza+szb-|inter|, and the
    // threshold J >= 0.9 is applied in EXACT integer form
    // (i/(sa+sb-i) >= 9/10  <=>  19*i >= 9*(sa+sb)) so no float boundary
    // exists.
    //
    // Join strategy: the lang block key has only 5 distinct values, so a
    // plain shuffle join would put all pairs on 5 reducers — and a
    // broadcast of the corpus-sized b side cannot run at 100 TB. Instead
    // SALT the key: side a gets salt = hash(a_id) mod R, side b is
    // replicated R times, and the join key becomes (lang, salt) — 5*R
    // sub-keys spread over the cluster, identical output rows, bounded
    // R× duplication of b instead of an unbounded driver broadcast.
    // (The asymptotic 100 TB answer remains MinHash-LSH banding, whose
    // band key is high-cardinality by construction; see SketchDedup.)
    val R = 8
    // persist: t feeds both sides of the pair join; caching the
    // one-row-per-doc bitmap table halves the tokenize+encode work
    val t = graft.functions.TokenBits.withBitmap(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          array_distinct(toks(col("text"))).as("tk"))
        .withColumn("sz", size(col("tk"))),
      "doc_id", "tk", "bits")
      .persistScratch()
    val a = t.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
      col("bits").as("a_bits"), col("sz").as("a_sz"))
      .withColumn("a_salt", pmod(hash(col("a_id")), lit(R)))
    val b = t.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("bits").as("b_bits"), col("sz").as("b_sz"))
      .withColumn("b_salt", explode(sequence(lit(0), lit(R - 1))))
    a.join(b,
        col("a_lang") === col("b_lang") && col("a_salt") === col("b_salt") &&
        col("a_id") < col("b_id") &&
        col("a_sz") * 10 >= col("b_sz") * 9 && col("b_sz") * 10 >= col("a_sz") * 9)
      .withColumn("inter",
        graft.functions.SketchExprs.bitmapAndCount(spark, col("a_bits"), col("b_bits")))
      .filter(col("inter") * 19 >= (col("a_sz") + col("b_sz")) * 9)
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double")
          / (col("a_sz") + col("b_sz") - col("inter")), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  def all: Seq[Q] = Seq(q29, q30, q31, q32)
}
