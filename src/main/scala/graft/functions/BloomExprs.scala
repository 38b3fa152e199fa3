package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, BloomFilterMightContain}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

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

  /** Per-row "does this sketch possibly contain ANY probe hash" — the
    * distributed form of a Bloom-MANIFEST probe (one row per data FILE,
    * sketch bytes in a binary column). Spark's own BloomFilterMightContain
    * requires the sketch side to be foldable / a scalar subquery, so it
    * can't test a sketch COLUMN; this expression can, which is what keeps
    * the manifest filter on executors — the sketch bytes never travel to
    * the driver, only the surviving file names do. Interpreted eval is
    * deliberate (CodegenFallback): input is manifest-sized (one row per
    * file) and the per-row cost is the sketch deserialization, not the
    * expression dispatch. */
  case class BloomMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_any"

    override protected def nullSafeEval(bloomBytes: Any, hs: Any): Any = {
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
      val hashes = hs.asInstanceOf[ArrayData].toLongArray()
      var i = 0
      while (i < hashes.length) {
        if (bf.mightContainLong(hashes(i))) return true
        i += 1
      }
      false
    }

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(l, r)
  }

  private val aggId = FunctionIdentifier("graft_bloom_agg")
  private val probeId = FunctionIdentifier("graft_might_contain")
  private val anyId = FunctionIdentifier("graft_bloom_any")

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
    if (!fr.functionExists(anyId)) {
      fr.registerFunction(anyId,
        new ExpressionInfo(classOf[BloomMightContainAny].getName, anyId.funcName),
        (es: Seq[Expression]) => BloomMightContainAny(es(0), es(1)))
    }
  }

  /** `graft_bloom_any(bloomCol, hashesCol)` as a Column. */
  def bloomAny(spark: SparkSession, bloom: Column, hashes: Column): Column = {
    register(spark); call_function("graft_bloom_any", bloom, hashes)
  }
}
