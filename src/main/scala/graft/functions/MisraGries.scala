package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

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
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
    b.get(x) match {
      case Some(c) => b.update(x, c + 1L)
      case None if b.size < capacity => b.update(x, 1L)
      case None =>
        // classic MG eviction: decrement every counter, drop zeros
        val dead = mutable.ArrayBuffer.empty[String]
        b.foreach { case (k, c) =>
          if (c == 1L) dead += k else b.update(k, c - 1L)
        }
        dead.foreach(b.remove)
    }
    b
  }

  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else a.update(k, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
