package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the PQ pipeline (mirrors VectorOps.pqTop5
  * piecewise to attribute wall time). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PQPROF $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val e = graft.sources.Tables.embeddings(spark, dir)
      .filter(size(col("embedding")) === 64 &&
        expr("forall(embedding, x -> abs(x) <= 1.0d)"))
    t("warm-scan") { e.count() }
    val sp = e.select(col("vec_id"),
        explode(expr("sequence(0, 15)")).as("s"), col("embedding"))
      .select(col("vec_id"), col("s").cast("int").as("s"),
        expr("slice(embedding, s * 4 + 1, 4)").as("sv"))
    t("sp") { sp.count() }
    val cb0 = sp.filter(col("vec_id") < 32)
      .select(col("vec_id").cast("int").as("c"), col("s"), col("sv").as("cv"))
    // MIRRORS VectorOps.pqAssign / the meanAt rollup exactly — keep in
    // sync with production or the attribution is for a different plan.
    graft.functions.VecExprs.registerL2(spark)
    def assign(cb: org.apache.spark.sql.DataFrame) = {
      val book = cb
        .groupBy("s").agg(collect_list(struct(col("c"), col("cv"))).as("cands"))
        .agg(expr("transform(array_sort(collect_list(struct(s, cands))), x -> x.cands)").as("book"))
      sp.crossJoin(broadcast(book))
        .select(col("vec_id"), col("s"), col("sv"), expr(
          """array_max(transform(try_element_at(book, s + 1), b -> struct(
            |  -round(graft_l2(sv, b.cv), 6) AS nl2,
            |  -b.c AS nc)))""".stripMargin).as("best"))
        .select(col("vec_id"), col("s"),
          (-col("best.nc")).cast("int").as("code"), col("sv"))
    }
    t("assign0") { assign(cb0).count() }
    def meanAt(i: Int) =
      (sum(round(element_at(col("sv"), i).cast("double") * 1000000000L)
        .cast("decimal(38,0)")).cast("double") / lit(1000000000.0)
        / count(lit(1))).as(s"m$i")
    val cb = assign(cb0)
      .groupBy("s", "code")
      .agg(meanAt(1), meanAt(2), meanAt(3), meanAt(4))
      .select(col("s"), col("code").as("c"),
        array(col("m1"), col("m2"), col("m3"), col("m4")).as("cv"))
      .persist()
    t("cb-train") { cb.count() }
    val enc = assign(cb).select("vec_id", "s", "code").persist()
    t("enc") { enc.count() }
    val lut = sp.filter(col("vec_id") < 20)
      .join(broadcast(cb), "s")
      .select(col("vec_id").as("a_id"), col("s").as("ls"), col("c").as("lc"),
        (round(expr(
          """aggregate(zip_with(sv, cv, (x, y) -> CAST(x AS DOUBLE) * y),
            |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
          * 1000000)).cast("bigint").as("lutu"))
    t("lut") { lut.count() }
    val topW = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("adcu"), asc("b_id"))
    val top = enc.join(broadcast(lut),
        col("ls") === col("s") && col("lc") === col("code") &&
          col("a_id") =!= col("vec_id"))
      .groupBy(col("a_id"), col("vec_id").as("b_id"))
      .agg(sum("lutu").as("adcu"))
      .withColumn("rk", row_number().over(topW))
      .filter(col("rk") <= 5)
    t("adc-top5") { top.count() }
    spark.stop()
  }
}
