package graft

/** Degenerate-corpus robustness: at 100 TB the documents table WILL
  * contain empty texts, one-token rows, all-stopword boilerplate, exact
  * duplicates, unicode, and megabyte outliers. Every documents-only
  * graded query must complete on such a corpus — a divide-by-zero null is
  * acceptable output, an exception is not (one poison row must not kill a
  * 1000-executor job). The oracle can't cover this (the fixtures are
  * well-formed), so it's pinned here.
  */
class RobustnessSpec extends SparkTestBase {

  // Graded queries whose only input is the documents table.
  private val docOnly = Seq(
    "q_text_tokens", "q_text_wordcount", "q_dedup_hash", "q_dedup_near",
    "q_dedup_ngram", "q_dedup_minhash", "q_dedup_minhash_keep",
    "q_dedup_incremental", "q_dedup_recall", "q_dedup_cc",
    "q_dedup_simhash", "q_dedup_simhash_r1", "q_dedup_simhash_wide",
    "q_dedup_containment", "q_text_quality", "q_lang_id", "q_text_entropy",
    "q_text_ngram_lm", "q_text_tfidf", "q_text_cooccur", "q_text_phrase",
    "q_text_fingerprint", "q_text_repetition", "q_token_bpe",
    "q_doc_chunk", "q_doc_chunk_dedup", "q_doc_topk_quality",
    "q_sample_weighted", "q_multimodal_meta", "q_multimodal_frames",
    "q_multimodal_resize")

  test("documents-only queries survive a degenerate corpus") {
    val spk = spark
    import spk.implicits._
    val long = (1 to 5000).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      // (doc_id, text, lang, source)
      (0L, "", "en", "src0"),                       // empty text
      (1L, "solo", "en", "src0"),                   // one token
      (2L, "the the the the the", "en", "src1"),    // all stopwords, repeated
      (3L, "the fast key order sort", "en", "src1"),
      (4L, "the fast key order sort", "en", "src2"), // exact dup of 3
      (5L, "schlüssel übung müller straße", "de", "src0"), // unicode
      (6L, long, "de", "src1"),                     // 5000-token outlier
      (7L, "唯一 的 中文 行", "zh", "src2"),          // CJK tokens
      (8L, " ", "fr", "src0"),                      // whitespace only
      (9L, "a b a b a b a b", "fr", "src1")         // tiny vocab repetition
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_degenerate").toString
    rows.write.parquet(s"$dir/documents.parquet")
    val queries = SparkEntry.queries
    docOnly.foreach { name =>
      try {
        queries(name)(spk, dir).collect() // completion is the assertion
      } catch {
        case e: Throwable =>
          fail(s"$name threw on the degenerate corpus: ${e.getMessage}", e)
      } finally graft.sources.Scratch.releaseAll()
    }
  }
}
