package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Single-pass sketch expressions. The SQL-composable formulations
  * (SketchDedup's transform/filter pipelines) are semantically identical —
  * and remain the ORACLE formulation — but Catalyst's CollapseProject
  * re-inlines the token-hash array `hs` into every one of its references
  * (32 for simhash, 16 for a minhash signature), recomputing md5-per-token
  * dozens of times per row. These expressions consume `hs` exactly once
  * and do the whole sketch in one tight loop, inside codegen.
  *
  * All arithmetic mirrors the oracle SQL bit-for-bit: same hash constants,
  * same mod-p chain, same majority rule — so results stay hash-identical.
  */
object SketchExprs {
  val P = 2147483647L // 2^31 - 1

  /** 16-bit SimHash over a BIGINT hash array: bit k set iff a strict
    * majority of hashes have bit k set. */
  case class SimHash16(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      var sh = 0L
      var k = 0
      while (k < 16) {
        var c = 0
        var i = 0
        while (i < hs.length) { if (((hs(i) >> k) & 1L) == 1L) c += 1; i += 1 }
        if (2 * c > hs.length) sh |= (1L << k)
        k += 1
      }
      sh
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val hs = ctx.freshName("hs"); val sh = ctx.freshName("sh")
        val k = ctx.freshName("k"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
        s"""
           |long[] $hs = $a.toLongArray();
           |long $sh = 0L;
           |for (int $k = 0; $k < 16; $k++) {
           |  int $c = 0;
           |  for (int $i = 0; $i < $hs.length; $i++) {
           |    if ((($hs[$i] >> $k) & 1L) == 1L) $c++;
           |  }
           |  if (2 * $c > $hs.length) $sh |= (1L << $k);
           |}
           |${ev.value} = $sh;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
  }

  /** 16-value MinHash signature: sig[j] = min over h of
    * ((2654435761*(j+1) mod p) * h + (40503*(j+1)+17 mod p)) mod p. */
  case class MinHashSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      val out = new Array[Long](16)
      var j = 0
      while (j < 16) {
        val a = (2654435761L * (j + 1)) % P
        val b = (40503L * (j + 1) + 17) % P
        var mn = Long.MaxValue
        var i = 0
        while (i < hs.length) {
          val v = (a * hs(i) + b) % P
          if (v < mn) mn = v
          i += 1
        }
        out(j) = mn
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in => {
        val hs = ctx.freshName("hs"); val out = ctx.freshName("out")
        val j = ctx.freshName("j"); val i = ctx.freshName("i")
        val a = ctx.freshName("a"); val b = ctx.freshName("b")
        val mn = ctx.freshName("mn"); val v = ctx.freshName("v")
        s"""
           |long[] $hs = $in.toLongArray();
           |long[] $out = new long[16];
           |for (int $j = 0; $j < 16; $j++) {
           |  long $a = (2654435761L * ($j + 1)) % ${P}L;
           |  long $b = (40503L * ($j + 1) + 17) % ${P}L;
           |  long $mn = Long.MAX_VALUE;
           |  for (int $i = 0; $i < $hs.length; $i++) {
           |    long $v = ($a * $hs[$i] + $b) % ${P}L;
           |    if ($v < $mn) $mn = $v;
           |  }
           |  $out[$j] = $mn;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
  }

  /** Production-width SimHash: 60 bits (the portable token hash carries
    * 60 bits of entropy — md5 hex chars 1-15 — so a "64-bit" sketch here
    * is 60 meaningful bits; same majority rule per bit as SimHash16). */
  case class SimHashWide(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      var sh = 0L
      var k = 0
      while (k < 60) {
        var c = 0
        var i = 0
        while (i < hs.length) { if (((hs(i) >> k) & 1L) == 1L) c += 1; i += 1 }
        if (2 * c > hs.length) sh |= (1L << k)
        k += 1
      }
      sh
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val hs = ctx.freshName("hs"); val sh = ctx.freshName("sh")
        val k = ctx.freshName("k"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
        s"""
           |long[] $hs = $a.toLongArray();
           |long $sh = 0L;
           |for (int $k = 0; $k < 60; $k++) {
           |  int $c = 0;
           |  for (int $i = 0; $i < $hs.length; $i++) {
           |    if ((($hs[$i] >> $k) & 1L) == 1L) $c++;
           |  }
           |  if (2 * $c > $hs.length) $sh |= (1L << $k);
           |}
           |${ev.value} = $sh;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
  }

  /** popcount(a AND b) over two BIGINT bitmap arrays — the set-intersection
    * cardinality when sets are dictionary-encoded into bit positions. Per
    * pair this is W and+popcount ops (W = ceil(vocab/64)) instead of a
    * per-pair hash-set build over string tokens. */
  case class BitmapAndCount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val xs = l.asInstanceOf[ArrayData].toLongArray()
      val ys = r.asInstanceOf[ArrayData].toLongArray()
      val n = math.min(xs.length, ys.length)
      var acc = 0
      var i = 0
      while (i < n) { acc += java.lang.Long.bitCount(xs(i) & ys(i)); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
        s"""
           |long[] $xs = $l.toLongArray();
           |long[] $ys = $r.toLongArray();
           |int $n = Math.min($xs.length, $ys.length);
           |int $acc = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += java.lang.Long.bitCount($xs[$i] & $ys[$i]);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  private def reg(spark: SparkSession, name: String, cls: Class[_],
      builder: Seq[Expression] => Expression): Unit = {
    val fid = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(fid)) {
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(cls.getName, name), builder)
    }
  }

  def register(spark: SparkSession): Unit = synchronized {
    reg(spark, "graft_simhash16", classOf[SimHash16], es => SimHash16(es.head))
    reg(spark, "graft_simhash_wide", classOf[SimHashWide], es => SimHashWide(es.head))
    reg(spark, "graft_minhash_sig", classOf[MinHashSig], es => MinHashSig(es.head))
    reg(spark, "graft_bitmap_and_count", classOf[BitmapAndCount],
      es => BitmapAndCount(es.head, es(1)))
  }

  def simhash16(spark: SparkSession, hs: Column): Column = {
    register(spark); call_function("graft_simhash16", hs)
  }
  def simhashWide(spark: SparkSession, hs: Column): Column = {
    register(spark); call_function("graft_simhash_wide", hs)
  }
  def minhashSig(spark: SparkSession, hs: Column): Column = {
    register(spark); call_function("graft_minhash_sig", hs)
  }
  def bitmapAndCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("graft_bitmap_and_count", a, b)
  }
}
