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

  /** sum(c) computed exactly, returned as DOUBLE: SUM(units)/scale.
    *
    * The per-row units are BIGINT but the accumulator is DECIMAL(38,0):
    * at 100 TB (~1e11 rows/group × ~1e11 units/row) a BIGINT accumulator
    * would wrap silently past 9.2e18, while decimal sums either carry the
    * full value or fail loudly. DuckDB's SUM(BIGINT) already widens to
    * HUGEINT, so the oracle side matches. The final decimal→double division
    * rounds-to-nearest identically on both engines.
    */
  def exactSum(c: Column, scale: Long): Column =
    sum(units(c, scale).cast("decimal(38,0)")) / lit(scale.toDouble)

  /** avg(c) from exact ingredients: SUM(units)/scale/COUNT. The oracle must
    * use the same left-to-right division order. */
  def exactAvg(c: Column, scale: Long): Column =
    sum(units(c, scale).cast("decimal(38,0)")) / lit(scale.toDouble) / count(lit(1))

  /** Largest double strictly below 2^63 (= 2^63 - 1024). Every double with
    * |x| <= this bound casts to BIGINT without ANSI overflow on Spark and
    * to HUGEINT exactly on DuckDB, so the exact-long fast path below covers
    * the FULL range the pre-decimal implementation accepted — no window of
    * silently-diverging shortest-decimal fallback inside the old domain. */
  private val MaxLongExactDouble: Double =
    java.lang.Math.nextDown(9.223372036854775808e18)

  /** Per-row units for UNBOUNDED metric columns (events.value), as
    * DECIMAL(38,0), crash-free over the whole double range including
    * NaN/Infinity. Conversion contract, in branch order:
    *   1. NaN or ±Infinity → NULL (both engines' SUM skips NULL; without
    *      this branch a single non-finite row throws ANSI
    *      CAST_INVALID_INPUT — the exact poison-row class this helper
    *      exists to eliminate). The oracle SQL mirrors the branch.
    *   2. |round(c*scale)| <= largest-double-below-2^63 → BIGINT cast —
    *      exact binary truncation, bit-identical to DuckDB's
    *      CAST(... AS HUGEINT) — so every finite value the old long path
    *      accepted hashes identically.
    *   3. Beyond that (where the old path threw ANSI CAST_OVERFLOW and a
    *      single poison row killed the job) it falls back to Spark's
    *      shortest-decimal double→decimal cast, which may differ from
    *      DuckDB's exact-binary HUGEINT in the last digits — acceptable,
    *      because a double "cent count" past 2^53 never represented exact
    *      cents to begin with; the contract there is survival, not parity.
    *
    * Downstream `.cast("long")` at OUTPUT columns (revenue_cents,
    * filled_cents, ...) is a declared schema bound, not a robustness
    * gap: a group total past ±2^63 fails identically on both engines
    * (Spark ANSI CAST_OVERFLOW; DuckDB HUGEINT→BIGINT out of range) —
    * a loud capacity error, never an engine divergence. Widen the
    * output schema if a deployment's group totals can exceed it. */
  def unitsWide(c: Column, scale: Long): Column = {
    val r = round(c * scale)
    when(isnan(c) || abs(c) === Double.PositiveInfinity, lit(null).cast("decimal(38,0)"))
      .when(abs(r) <= MaxLongExactDouble, r.cast("long").cast("decimal(38,0)"))
      .otherwise(r.cast("decimal(38,0)"))
  }

  /** exactSum over [[unitsWide]] — for metric columns with no domain
    * bound (money columns are bounded 2dp: use [[exactSum]]). */
  def exactSumWide(c: Column, scale: Long): Column =
    sum(unitsWide(c, scale)) / lit(scale.toDouble)

  /** Matching DuckDB SQL fragments (kept adjacent so the two sides never
    * drift). DuckDB SUM(BIGINT) returns HUGEINT (128-bit) natively. */
  def sqlUnits(e: String, scale: Long): String =
    s"CAST(round(($e) * $scale) AS BIGINT)"
  def sqlExactSum(e: String, scale: Long): String =
    s"SUM(${sqlUnits(e, scale)}) / $scale.0"
  def sqlExactSumWide(e: String, scale: Long): String =
    s"SUM(${sqlUnitsWide(e, scale)}) / $scale.0"

  /** DuckDB twin of [[unitsWide]]'s NaN/Inf→NULL branch (branch 2 vs 3 need
    * no SQL split: HUGEINT covers both exactly on DuckDB). */
  def sqlUnitsWide(e: String, scale: Long): String =
    s"CASE WHEN isnan($e) OR isinf($e) THEN NULL ELSE CAST(round(($e) * $scale) AS HUGEINT) END"
  def sqlExactAvg(e: String, scale: Long): String =
    s"SUM(${sqlUnits(e, scale)}) / $scale.0 / COUNT(*)"
}
