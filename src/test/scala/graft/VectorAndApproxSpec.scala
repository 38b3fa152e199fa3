package graft

import org.apache.spark.sql.functions._
import graft.functions.VecExprs

/** The custom DotProduct expression and the approx-distinct (Q17) bound. */
class VectorAndApproxSpec extends SparkTestBase {

  test("dot(v, v) == 1 for unit-norm fixture vectors (codegen path)") {
    val e = graft.sources.Tables.embeddings(spark, sf())
    val selfSims = e.select(
        round(VecExprs.dot(spark, col("embedding"), col("embedding")), 4).as("s"))
      .distinct().collect().map(_.getDouble(0))
    assert(selfSims.forall(s => math.abs(s - 1.0) <= 0.001),
      s"self-cosine not ~1: ${selfSims.mkString(",")}")
  }

  test("DotProduct matches the higher-order-function formulation exactly") {
    val e = graft.sources.Tables.embeddings(spark, sf()).limit(50)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    val hof = expr(
      """aggregate(zip_with(a_vec, b_vec,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
    val diff = a.join(b, col("a_id") < col("b_id"))
      .select((VecExprs.dot(spark, col("a_vec"), col("b_vec")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0, "codegen dot must be bit-identical to the HOF fold")
  }

  test("interpreted eval matches codegen result") {
    import graft.functions.DotProduct
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val xs = Array(0.5f, -0.25f, 0.125f)
    val lit1 = Literal.create(ArrayData.toArrayData(xs), ArrayType(FloatType))
    val v = DotProduct(lit1, lit1).eval(null).asInstanceOf[Double]
    val expected = xs.map(x => x.toDouble * x.toDouble).sum
    assert(v === expected)
  }

  test("approx_count_distinct within 5% of exact per group (Q17 contract)") {
    val df = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
    val got = df.groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()
    got.foreach { r =>
      val (a, x) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - x) / x <= 0.05,
        s"flag ${r.getString(0)}: approx $a vs exact $x off by >5%")
    }
  }

  test("percentile_approx within rank-accuracy bound of exact percentile") {
    // accuracy=1000 guarantees the returned value's RANK is within
    // n/1000 of the target rank; assert via the exact percentiles of the
    // surrounding rank band (a value-error bound would be distribution-
    // dependent and wrong)
    val spk = spark
    val df = graft.sources.Tables.lineitem(spk, sf("sf0.01"))
    Seq(0.5, 0.95).foreach { p =>
      val eps = 2.0 / 1000 // 2x slack on the nominal 1/accuracy rank error
      val rows = df.groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(p), lit(1000)).as("approx"),
          expr(s"percentile(l_extendedprice, ${math.max(0.0, p - eps)})").as("lo"),
          expr(s"percentile(l_extendedprice, ${math.min(1.0, p + eps)})").as("hi"))
        .collect()
      rows.foreach { r =>
        val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(a >= lo && a <= hi,
          s"flag ${r.getString(0)} p=$p: approx $a outside exact rank band [$lo, $hi]")
      }
    }
  }

  test("OR-amplified multi-table LSH recall@3 >= single-table recall@3") {
    // Table 0 of q_vec_lsh_multi IS q_vec_lsh_bucketed's index, so the
    // multi-table candidate set is a superset and recall vs brute-force
    // ground truth can only improve — verify the implementation preserves
    // that construction instead of assuming it.
    val dir = sf()
    def pairs(q: graft.Q): Set[(Long, Long)] =
      q.fn(spark, dir).select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = { // exact top-3 per query vector over the full corpus
      val e = graft.sources.Tables.embeddings(spark, dir)
      val a = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("a_id").orderBy(desc("sim"), asc("b_id"))
      a.join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(VecExprs.dot(spark, col("a_vec"), col("b_vec")), 6).as("sim"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val single = pairs(graft.operators.VectorOps.qVecLshBucketed)
    val multi = pairs(graft.operators.VectorOps.qVecLshMulti)
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle,
      s"multi-table recall $rMulti < single-table recall $rSingle")
    assert(rMulti > 0.0)
  }
}
