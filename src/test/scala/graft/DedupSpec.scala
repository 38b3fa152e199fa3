package graft

import org.apache.spark.sql.functions._

/** Dedup operators on synthetic data: the fixtures contain no exact
  * duplicates (verified in FIXTURES.md), so Q31's collapse behavior and
  * idempotence are asserted here with planted dups. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick fox", "en"), (2L, "the quick fox", "en"), // exact dup
    (3L, "the quick fox", "de"), // same text, other lang — still same hash
    (4L, "lazy dog sleeps", "en"),
    (5L, "lazy dog sleeps here", "en")
  ).toDF("doc_id", "text", "lang")

  private def survivors = docs
    .groupBy(sha2(col("text"), 256).as("h"))
    .agg(min("doc_id").as("doc_id"))

  test("hash dedup keeps min(doc_id) per content hash") {
    val kept = survivors.select("doc_id").as[Long].collect().sorted
    // "the quick fox" appears 3x (ids 1,2,3) -> keep 1; others unique
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("hash dedup is idempotent") {
    val once = docs.join(survivors, "doc_id")
    val twice = once
      .groupBy(sha2(col("text"), 256).as("h")).agg(min("doc_id").as("doc_id"))
    assert(twice.count() === once.count())
  }

  test("jaccard is symmetric and within [0,1]") {
    val t = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tk"))
    val a = t.toDF("a_id", "a_tk")
    val b = t.toDF("b_id", "b_tk")
    val j = a.crossJoin(b)
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_tk"), col("b_tk"))).cast("double")
          / size(array_union(col("a_tk"), col("b_tk")))).as("j"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    j.foreach { case ((x, y), v) =>
      assert(v >= 0.0 && v <= 1.0)
      assert(v === j((y, x))) // symmetry
      if (x == y) assert(v === 1.0) // self-similarity
    }
  }

  test("minhash-LSH candidates achieve full recall on planted near-dups at J>=0.9") {
    // ids 4 and 5 share 3 of 4 tokens (J=0.75) — NOT a candidate at 0.9;
    // ids 1,2,3 are identical (J=1.0) — MUST be candidates.
    val spk = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_mh").toString
    docs.withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.SketchDedup.qDedupMinhash.fn(spk, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L))) // identical, same lang block
    assert(!out.exists { case (x, y) => Set(x, y) == Set(4L, 5L) }) // J=0.75 < 0.9
  }
}
