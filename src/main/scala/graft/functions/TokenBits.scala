package graft.functions

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
  * and the DuckDB oracle keeps its plain list formulation.
  *
  * Scale notes: the dictionary is vocab-sized. Its row_number runs in a
  * single-partition window — fine up to millions of terms; past that,
  * switch to monotonically_increasing_id + a dense re-map, or hash ids
  * with collision audit. The two builder aggregations shuffle one row per
  * (doc, word) — linear in corpus size, not quadratic.
  */
object TokenBits {

  /** Adds `bitsCol` (array<bigint>) to `df`, encoding `setCol` (an array
    * of distinct strings) against a dictionary built from ALL rows.
    * `keyCol` must be unique per row. */
  def withBitmap(df: DataFrame, keyCol: String, setCol: String,
      bitsCol: String): DataFrame = {
    val exploded = df.select(col(keyCol), explode(col(setCol)).as("__t"))
    val dict = exploded.select("__t").distinct()
      .withColumn("__id", (row_number().over(Window.orderBy("__t")) - 1).cast("int"))
    val vocab = dict.count().toInt // driver-side scalar: bitmap width config
    val nWords = if (vocab == 0) 1 else (vocab - 1) / 64 + 1
    val words = exploded.join(broadcast(dict), "__t")
      .groupBy(col(keyCol), expr("__id div 64").cast("int").as("__w"))
      // ids are distinct within a row, so sum of single-bit values == OR
      .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), __id % 64))").as("__m"))
      .groupBy(keyCol)
      .agg(map_from_entries(sort_array(collect_list(struct(col("__w"), col("__m")))))
        .as("__wm"))
      .withColumn(bitsCol,
        expr(s"transform(sequence(0, ${nWords - 1}), wi -> coalesce(element_at(__wm, wi), CAST(0 AS BIGINT)))"))
      .select(col(keyCol), col(bitsCol))
    df.join(words, keyCol)
  }
}
