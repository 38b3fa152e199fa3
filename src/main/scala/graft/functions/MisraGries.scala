package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a partial-aggregation-capable typed
  * Aggregator — the one-pass alternative to a full-width `groupBy(token)`
  * when only the frequent tail matters.
  *
  * Each partition maintains at most `capacity` counters (`reduce`); merging
  * two summaries (`merge`) adds counts and, if over capacity, subtracts the
  * (capacity+1)-th largest count from every counter and drops the
  * non-positives — the standard MG merge, which preserves the deterministic
  * guarantee: any item with true frequency > n/capacity SURVIVES in the
  * merged summary (estimates may undercount by at most n/capacity, never
  * over). So for a heavy-hitter threshold freq > n/K with K <= capacity,
  * the summary's key set is a guaranteed SUPERSET of the true heavy
  * hitters, and an exact counting pass restricted to those <= capacity
  * candidates recovers exact counts — one narrow summary crosses the
  * shuffle instead of the whole token stream's distinct domain.
  *
  * Scale: the per-executor state is O(capacity), the merged state at the
  * driver is O(capacity), and the only corpus-wide work is the map-side
  * scan — the shape that holds at 100 TB where the distinct-token domain
  * (and thus a full groupBy's shuffle) is unbounded.
  *
  * The buffer/output encoders are Catalyst MAP encoders, not Kryo:
  * Kryo's FieldSerializer reflects into JDK internals (HeapByteBuffer)
  * and dies without the full `--add-opens` set when the session is built
  * outside spark-submit — a deployment-environment dependency a library
  * must not carry. The buffer object lives on-heap between `reduce`
  * calls (ObjectHashAggregate keeps typed buffers as objects; the
  * encoder only runs at partial-output boundaries), so the immutable
  * Map's per-update allocation is row-local garbage, never a
  * serialization cost.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < capacity => b.updated(x, 1L)
      case None =>
        // classic MG eviction: decrement every counter, drop zeros
        b.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0
      val cut = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      m.collect { case (k, c) if c - cut > 0L => k -> (c - cut) }
    } else m
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
