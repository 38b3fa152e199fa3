package graft.functions

import graft.sources.Scratch.PersistSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary-encoded set bitmaps: turn a distinct-string-array column
  * into a fixed-width array<bigint> bitmap so pairwise set intersection
  * becomes SketchExprs.BitmapAndCount — W and+popcount ops per pair
  * instead of a per-pair string hash-set build. For the fixture corpus
  * (vocab 31 → W=1) a pair costs ONE and+popcount.
  *
  * Exactness: the dictionary is an exact bijection token↔bit, so
  * popcount(a AND b) == |A ∩ B| — results are identical to array_intersect
  * and the DuckDB oracle keeps its plain list formulation. Which token maps
  * to which bit differs between the small and large dictionary paths, but
  * intersection cardinality is invariant under any bijection.
  *
  * Scale notes: the dictionary is vocab-sized, not corpus-sized. Up to
  * [[TokenBits.SmallVocab]] terms it is id-assigned by one global
  * row_number window (single partition — cheap at that size) and broadcast
  * into the encode join. Past that, ids come from the partition-offset
  * remap in [[TokenBits.denseIds]]: hash-bucket the terms, number each
  * bucket in parallel, add per-bucket offsets (a bucket-count-sized driver
  * aggregate — 256 rows, not vocab rows) — no single-partition stage and
  * no driver-sized collect anywhere. The two builder aggregations shuffle
  * one row per (doc, word) — linear in corpus size, not quadratic. The
  * bitmap itself is ceil(vocab/64) longs per doc, which is what really
  * bounds this technique: beyond ~1M terms switch to MinHash sketches
  * (SketchDedup) instead of exact bitmaps.
  */
object TokenBits {

  /** Vocab size up to which the single-window dictionary path is used. */
  val SmallVocab: Long = 1L << 16

  /** Hash buckets for the large-vocab dense-id remap. */
  private val DictBuckets = 256

  /** Adds `bitsCol` (array<bigint>) to `df`, encoding `setCol` (an array
    * of distinct strings) against a dictionary built from ALL rows.
    * `keyCol` must be unique per row. Rows whose set is empty survive
    * with an all-zero bitmap (left join + coalesce — an inner join would
    * silently drop them because explode yields no rows). */
  def withBitmap(df: DataFrame, keyCol: String, setCol: String,
      bitsCol: String): DataFrame = {
    // persist both shared sub-DAGs: `exploded` (corpus-linear incidences)
    // feeds the vocab count, the dictionary AND the encode join — without
    // the cache the tokenize+explode runs three times. At fixture scale
    // the saving is inside run-to-run noise (tokenize is cheap next to
    // the encode shuffles), but at 100 TB three corpus passes vs one is
    // the difference that matters; the cache is the (doc, token)
    // incidence list a production pipeline materializes anyway.
    val exploded = df.select(col(keyCol), explode(col(setCol)).as("__t")).persistScratch()
    val terms = exploded.select("__t").distinct().persistScratch()
    val vocab = terms.count() // driver-side scalar: bitmap width config
    val nWords = if (vocab == 0) 1 else ((vocab - 1) / 64 + 1).toInt
    val small = vocab <= SmallVocab
    val dict =
      if (small)
        terms.withColumn("__id",
          (row_number().over(Window.orderBy("__t")) - 1).cast("int"))
      else denseIds(terms)
    // size-gated hint: the dictionary is provably small on the small path;
    // on the large path let AQE pick the strategy for the vocab-sized side
    val words = exploded.join(if (small) broadcast(dict) else dict, "__t")
      .groupBy(col(keyCol), expr("__id div 64").cast("int").as("__w"))
      // ids are distinct within a row, so sum of single-bit values == OR
      .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), __id % 64))").as("__m"))
      .groupBy(keyCol)
      .agg(map_from_entries(sort_array(collect_list(struct(col("__w"), col("__m")))))
        .as("__wm"))
      .withColumn(bitsCol,
        expr(s"transform(sequence(0, ${nWords - 1}), wi -> coalesce(element_at(__wm, wi), CAST(0 AS BIGINT)))"))
      .select(col(keyCol), col(bitsCol))
    df.join(words, Seq(keyCol), "left")
      .withColumn(bitsCol, coalesce(col(bitsCol),
        expr(s"transform(sequence(0, ${nWords - 1}), wi -> CAST(0 AS BIGINT))")))
  }

  /** Dense 0..vocab-1 ids without a single-partition window: hash the
    * terms into [[DictBuckets]] buckets, row_number each bucket in
    * parallel (the window partitions by bucket), then add cumulative
    * per-bucket offsets. The only driver action is the bucket-count
    * aggregate — [[DictBuckets]] rows regardless of vocab size. */
  private def denseIds(terms: DataFrame): DataFrame = {
    val bucketed = terms.withColumn("__p", pmod(hash(col("__t")), lit(DictBuckets)))
    val local = bucketed.withColumn("__li",
      (row_number().over(Window.partitionBy("__p").orderBy("__t")) - 1).cast("long"))
    val counts = local.groupBy("__p").agg(count(lit(1)).as("__c"))
      .orderBy("__p").collect()
    var off = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), off); off += r.getLong(1); o
    }.toIndexedSeq
    val spark = terms.sparkSession
    import spark.implicits._
    local.join(broadcast(offsets.toDF("__p", "__off")), "__p")
      .withColumn("__id", (col("__off") + col("__li")).cast("int"))
      .select("__t", "__id")
  }
}
