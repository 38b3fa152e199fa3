package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-local k-token shingle construction — the map-side formulation of
  * every shingle family (n-gram near-dup, novelty, boilerplate, dup-mass,
  * winnowing, decontamination).
  *
  * Scale contract: shingling is ROW-LOCAL, so it is built entirely inside
  * the token array (a `transform` over the start-position `sequence`) and
  * the token stream is NEVER exploded, window-sorted, or re-shuffled just
  * to assemble shingles. The only exchange a shingle family pays is the
  * one keyed by the shingle itself (the groupBy/join that needs cross-doc
  * visibility) — which no construction can avoid. This replaces the
  * posexplode → Window(lead) → dropDuplicates idiom, which paid TWO extra
  * token-stream-sized exchanges per query (the window sort by (doc_id, p)
  * and the per-doc dedup) before the real shingle-keyed exchange.
  *
  * CollapseProject discipline: callers MUST alias the token array in its
  * own projection (`.select(split(col("text"), " ").as("tk"))`) and pass
  * `col("tk")` here. These builders reference the array at least twice
  * (size guard + slice inside the lambda), which stops CollapseProject
  * from inlining the non-cheap split() into the lambda body — where it
  * would re-evaluate once per shingle (the measured ~50x regression that
  * kept earlier rounds on the window idiom).
  *
  * Explode discipline: explode the shingle array with EXPLODE_OUTER plus
  * a post-Generate isNotNull filter, never plain explode. A non-outer
  * Generate triggers the optimizer's InferFiltersFromGenerate rule, which
  * synthesizes `size(expr) > 0 AND isnotnull(expr)` below the Generate
  * with the ENTIRE shingle construction inlined (split(text) re-evaluated
  * inside the lambdas, several copies per row) — measured 266 s vs 1 s on
  * the winnow fingerprint build at sf0.1. Outer explode is exempt from
  * the rule (an empty array must still emit its null row), and the
  * explicit isNotNull filter on the generator OUTPUT attribute restores
  * inner-explode semantics for one cheap comparison per row.
  * PlanShapeSpec locks all of it: exactly one split() in the optimized
  * plan, and no Window / no Exchange below the first shingle-keyed
  * operator.
  */
object Shingles {

  /** All k-token shingles of `toks`, one per start position, in document
    * order (index i = shingle starting at 0-based token position i).
    * Empty array when the document is shorter than k tokens. */
  def all(toks: Column, k: Int): Column = {
    require(k >= 1, s"shingle width must be >= 1, got $k")
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** The document's DISTINCT shingle set (order unspecified — feed an
    * explode + shingle-keyed aggregate, never a positional consumer). */
  def distinctSet(toks: Column, k: Int): Column = array_distinct(all(toks, k))
}
