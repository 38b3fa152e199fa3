package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** dot(a, b) over two float32 vectors as a native Catalyst expression with
  * whole-stage codegen.
  *
  * The same value is expressible with pure higher-order functions —
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`,
  * verified byte-identical vs the DuckDB oracle (SURVEY §2.7 Q33) — but
  * that shape allocates a 64-element intermediate array and walks a lambda
  * interpreter per pair. On an all-pairs kNN at sf0.1 (2M pairs) the HOF
  * form measured ~15 s; this expression is a tight primitive loop inside
  * WholeStageCodegen. At 100 TB the same expression serves every vector
  * operator, so the win compounds.
  *
  * Determinism: ascending-index loop, double accumulation — the exact
  * association order DuckDB's list_sum uses, so results stay bit-identical
  * cross-engine (and partition-count independent: it's a per-row scalar).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are produced internally (always ArrayType(FloatType) columns),
  // so no ExpectsInputTypes contract — AbstractDataType is private to
  // Spark in 4.x
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i).toDouble * ys(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance Σ(x−y)² between two vectors, EACH independently a
  * float32 or float64 array (the corpus side is float parquet; a
  * codebook/centroid may be a double array after integer-unit mean
  * training). Both sides type-dispatch at planning time from the child
  * dataType — reading a double array as floats would silently
  * reinterpret half of each value's bits (the function is exposed to any
  * spark.sql user via GraftExtensions, where double is the default
  * float-literal type). Same motivation and determinism contract as
  * [[DotProduct]]: the HOF form `aggregate(zip_with(a, b, (x,y) ->
  * (double(x)-y)*(double(x)-y)), 0d, +)` allocates an intermediate array
  * and interprets a lambda per element — inside ANOTHER lambda (the PQ
  * candidate scan) that cost multiplies by the codebook width. This
  * evaluates as one tight loop per call; ascending-index double
  * accumulation keeps it bit-identical to DuckDB's list_sum fold. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_l2"

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val leftIsDouble: Boolean = isDoubleArr(left)
  private lazy val rightIsDouble: Boolean = isDoubleArr(right)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_l2 requires array<float> or array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def toDoubles(a: Any, isDouble: Boolean): Array[Double] = {
    val ad = a.asInstanceOf[ArrayData]
    if (isDouble) ad.toDoubleArray()
    else {
      val fs = ad.toFloatArray()
      Array.tabulate(fs.length)(i => fs(i).toDouble)
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = toDoubles(a, leftIsDouble)
    val ys = toDoubles(b, rightIsDouble)
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = xs(i) - ys(i); acc += d * d; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def arr(isDouble: Boolean) =
        if (isDouble) ("double", "toDoubleArray") else ("float", "toFloatArray")
      val (xt, xext) = arr(leftIsDouble)
      val (yt, yext) = arr(rightIsDouble)
      s"""
         |$xt[] $xs = $a.$xext();
         |$yt[] $ys = $b.$yext();
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $xs[$i] - (double) $ys[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExprs {
  private val fid = FunctionIdentifier("graft_dot")
  private val l2fid = FunctionIdentifier("graft_l2")

  /** Registers graft_dot in the session's function registry (idempotent);
    * also makes it available to spark.sql(...) users. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(fid)) {
      spark.sessionState.functionRegistry.registerFunction(
        fid,
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    }
  }

  /** Registers graft_l2 (squared L2 distance) — see [[L2Squared]]. */
  def registerL2(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(l2fid)) {
      spark.sessionState.functionRegistry.registerFunction(
        l2fid,
        new ExpressionInfo(classOf[L2Squared].getName, "graft_l2"),
        (children: Seq[Expression]) => L2Squared(children.head, children(1)))
    }
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
