package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Exposes Spark's built-in (but not publicly registered) Bloom-filter
  * expression pair — the same machinery the optimizer's runtime row-level
  * filtering (InjectRuntimeFilter) uses — under `graft_` names, so a query
  * can build the filter EXPLICITLY:
  *
  *   build side:  graft_bloom_agg(xxhash64(k), estItems, numBits)
  *   probe side:  graft_might_contain((SELECT <build agg> ...), xxhash64(k))
  *
  * `graft_bloom_agg` is a TypedImperativeAggregate whose binary sketch
  * merges associatively (partial → final), so the build is one distributed
  * pass over the small side; `graft_might_contain` is a per-row bit test
  * evaluated at the probe scan, BEFORE any exchange. That order — cheap
  * approximate prefilter at the scan, exact semi-join after — is the 100 TB
  * semi-join shape: the shuffle only ever sees rows that plausibly match.
  * The analyzer requires the bloom argument to be a scalar subquery (or
  * literal), which is why the consuming query goes through `spark.sql`.
  */
object BloomExprs {

  private val aggId = FunctionIdentifier("graft_bloom_agg")
  private val probeId = FunctionIdentifier("graft_might_contain")

  def register(spark: SparkSession): Unit = synchronized {
    val fr = spark.sessionState.functionRegistry
    if (!fr.functionExists(aggId)) {
      fr.registerFunction(aggId,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, aggId.funcName),
        (es: Seq[Expression]) => new BloomFilterAggregate(es(0), es(1), es(2)))
    }
    if (!fr.functionExists(probeId)) {
      fr.registerFunction(probeId,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, probeId.funcName),
        (es: Seq[Expression]) => BloomFilterMightContain(es(0), es(1)))
    }
  }
}
