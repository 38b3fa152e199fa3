package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine float-determinism helpers (SURVEY.md §2.7).
  *
  * Parallel double summation is association-order dependent, so a plain
  * `sum(double)` can differ between Spark and the DuckDB oracle (and between
  * two Spark runs with different partitionings). The fixtures' money/measure
  * columns are exact 2-decimal values, so we scale each row to integer
  * units (exact), sum as BIGINT (exact, associative — safe at any
  * parallelism, including a 1000-executor cluster), and divide once at the
  * end (a single IEEE op on identical inputs ⇒ identical output). The same
  * expression shape is used verbatim in the oracle SQL.
  */
object Det {

  /** Exact integer units for a fixed-decimal column: round(c * scale) as
    * BIGINT. `scale` must be 10^d where d covers the column's decimals
    * (100 for 2dp money; 10000 for price*(1-disc); 1e6 for 3-factor). */
  def units(c: Column, scale: Long): Column =
    round(c * scale).cast("long")

  /** sum(c) computed exactly, returned as DOUBLE: SUM(units)/scale. */
  def exactSum(c: Column, scale: Long): Column =
    sum(units(c, scale)) / lit(scale.toDouble)

  /** avg(c) from exact ingredients: SUM(units)/scale/COUNT. The oracle must
    * use the same left-to-right division order. */
  def exactAvg(c: Column, scale: Long): Column =
    sum(units(c, scale)) / lit(scale.toDouble) / count(lit(1))

  /** Matching DuckDB SQL fragments (kept adjacent so the two sides never
    * drift). */
  def sqlUnits(e: String, scale: Long): String =
    s"CAST(round(($e) * $scale) AS BIGINT)"
  def sqlExactSum(e: String, scale: Long): String =
    s"SUM(${sqlUnits(e, scale)}) / $scale.0"
  def sqlExactAvg(e: String, scale: Long): String =
    s"SUM(${sqlUnits(e, scale)}) / $scale.0 / COUNT(*)"
}
