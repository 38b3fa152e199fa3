package graft.operators

import graft.sources.Scratch.PersistSyntax
import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — the write-once / probe-many form of
  * `q_dedup_incremental`. That query re-derives the corpus band index on
  * every run; at 100 TB the index must live as a bucketed parquet artifact
  * each ingest cycle reads back and probes with its new batch, never
  * re-scanning (or re-tokenizing) the corpus.
  *
  * The artifact is two bucketed tables:
  *   - `<name>_bands`  (doc_id, lang, band, sig), bucketed on the full
  *     band-join key (lang, band, sig) — the candidate-gen probe join
  *     reads it already clustered on its join key, so only the (small)
  *     batch side shuffles; the corpus side never moves.
  *   - `<name>_tokens` (doc_id, lang, tk, sz), bucketed on doc_id — the
  *     exact-verify lookup joins candidates by corpus doc id against an
  *     already-clustered table.
  *
  * The verify set representation is the distinct token ARRAY, not the
  * in-memory pipeline's dense bitmap: TokenBits bitmaps are encoded
  * against a corpus-local dictionary, which a later batch (with unseen
  * vocabulary) could not join against without also versioning the
  * dictionary. Token arrays are dictionary-free, and
  * `size(array_intersect(a, b))` over distinct arrays equals the bitmap
  * AND-popcount exactly, so [[probe]] returns bit-identical survivors to
  * the in-memory path (DedupSpec asserts this against
  * `q_dedup_incremental`).
  *
  * Incremental maintenance: after a batch is admitted, [[append]] adds its
  * token and band rows to the same tables (per-document derivations, so an
  * append never touches existing rows) — write once, probe+append per
  * ingest cycle, never a corpus rebuild (DedupSpec proves a second batch
  * near-dupping an appended document is caught).
  */
object DedupIndex {

  /** Write the corpus dedup index for `corpus` (documents-shaped: doc_id,
    * text, lang) as bucketed tables `<name>_bands` / `<name>_tokens`. */
  def write(corpus: DataFrame, name: String, buckets: Int = 8): Unit = {
    val spark = corpus.sparkSession
    // tokenize once: the token frame feeds both its own table and the
    // minhash/band derivation
    val tok = SketchDedup.tokenFrameOf(corpus).persistScratch()
    Sinks.writeBucketed(tok, buckets, Seq("doc_id"), s"${name}_tokens")
    Sinks.writeBucketed(SketchDedup.bandsOfTokens(spark, tok), buckets,
      Seq("lang", "band", "sig"), s"${name}_bands")
  }

  /** ADMIT a probed batch into the index: append its token and band rows
    * to the same bucketed tables. Both derivations are per-document, so
    * an append never touches existing rows, and each appended file set is
    * itself bucket-clustered — the ingest-cycle maintenance operation
    * (write once, then probe+append per cycle, never a corpus rebuild). */
  def append(batch: DataFrame, name: String, buckets: Int = 8): Unit = {
    val spark = batch.sparkSession
    val tok = SketchDedup.tokenFrameOf(batch).persistScratch()
    Sinks.writeBucketed(tok, buckets, Seq("doc_id"), s"${name}_tokens",
      org.apache.spark.sql.SaveMode.Append)
    Sinks.writeBucketed(SketchDedup.bandsOfTokens(spark, tok), buckets,
      Seq("lang", "band", "sig"), s"${name}_bands",
      org.apache.spark.sql.SaveMode.Append)
  }

  /** Probe the persisted index with a new batch: per new document, how
    * many near-duplicates (exact Jaccard ≥ 0.9, the same 19/9 integer
    * threshold as the whole minhash family) it has in the indexed corpus
    * and the smallest matching corpus id — `q_dedup_incremental`'s output
    * contract, but against the read-back artifact. */
  def probe(spark: SparkSession, name: String, batch: DataFrame): DataFrame = {
    val corpusBands = spark.table(s"${name}_bands")
    val corpusTok = spark.table(s"${name}_tokens")
    // batch tokens feed candidate-gen AND verify; the batch is the small,
    // per-cycle side — persisting it is bounded by ingest size
    val btok = SketchDedup.tokenFrameOf(batch).persistScratch()
    val bbands = SketchDedup.bandsOfTokens(spark, btok)
      .select(col("doc_id").as("new_id"), col("lang").as("b_lang"),
        col("band").as("b_band"), col("sig").as("b_sig"))
    val cand = corpusBands.join(bbands,
        col("lang") === col("b_lang") && col("band") === col("b_band") &&
        col("sig") === col("b_sig"))
      .select(col("new_id"), col("doc_id").as("corpus_id")).distinct()
    cand
      .join(corpusTok.select(col("doc_id").as("corpus_id"),
        col("tk").as("a_tk"), col("sz").as("a_sz")), "corpus_id")
      .join(btok.select(col("doc_id").as("new_id"),
        col("tk").as("b_tk"), col("sz").as("b_sz")), "new_id")
      .withColumn("inter", size(array_intersect(col("a_tk"), col("b_tk"))))
      .filter(col("inter") * 19 >= (col("a_sz") + col("b_sz")) * 9)
      .groupBy("new_id")
      .agg(count(lit(1)).as("n_dups"), min("corpus_id").as("first_dup"))
      .orderBy("new_id")
  }
}
