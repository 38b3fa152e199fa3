package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY.md §2.4 Q18): geometric mean via sum-of-logs.
  *
  * Covers the `Aggregator[IN, BUF, OUT]` surface deliberately — the same
  * result is expressible as `exp(avg(ln(x)))`, but the point is a
  * partial-aggregation-capable custom aggregate: `reduce` runs map-side on
  * each partition, only the (logSum, count) pair crosses the shuffle, and
  * `merge` is associative — the shape that scales to 1000 executors.
  * Non-positive inputs are ignored (log undefined), mirroring the
  * `WHERE x > 0` the oracle applies.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(r: (Double, Long)): Double =
    if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
