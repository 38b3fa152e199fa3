package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salt the skewed (big) side into R
  * sub-keys and replicate the small side R times, so one hot key spreads
  * over R tasks instead of stalling a single reducer.
  *
  * AQE's OptimizeSkewedJoin handles most skew at runtime by splitting
  * oversized partitions; explicit salting remains the tool when one KEY
  * (not just one partition) is hot — AQE can split a partition's files,
  * not a single key's hash bucket, for shuffled-hash buildsides and
  * aggregations-over-join patterns. Results are identical to the unsalted
  * join: salt only refines the partitioning key.
  */
object Salting {

  /** Inner equi-join `big ⋈ small` on `key` (same column name both sides)
    * with `r`-way salting. The big side's salt is derived from its row
    * content hash — deterministic, and rows sharing the hot key still
    * spread because the OTHER columns differ. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, r: Int): DataFrame = {
    require(r > 0, s"salt factor must be positive, got $r")
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(r)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(r - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
