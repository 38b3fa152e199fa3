package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the q_graph_pagerank pipeline on
  * SPARK_GRAFT_SF_DIR — where do the seconds go (pair distinct, edge
  * materialization, per-iteration join+agg, final top-k)? Not part of the
  * graded surface. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    graft.RunId.ensure() // per-process fixture-log path before log4j init
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // A/B knob: SPARK_GRAFT_AQE=0 measures the AQE stage-barrier floor's
      // share of the iterative pipeline (plans here are fixed-shape, so
      // AQE's runtime re-planning buys nothing at bench scale)
      .config("spark.sql.adaptive.enabled",
        !sys.env.get("SPARK_GRAFT_AQE").contains("0"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey")
    val ord = graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey")
    // mirror the graded query's shipped shape (GraphOps.qGraphPagerank):
    // one join pass, explode-symmetrize, dedup after the u-repartition,
    // destination degree attached to the edge list once
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("cu"),
        (col("l_suppkey") * 2 + 1).cast("long").as("sv"))
    time("raw join only")(println(raw.count()))
    val sym = raw
      .select(explode(array(
        struct(col("cu").as("u"), col("sv").as("v")),
        struct(col("sv").as("u"), col("cu").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    time("sym (join+explode, no shuffle)")(println(sym.count()))
    val edges = sym
      .repartition(col("u"))
      .dropDuplicates("u", "v").persist()
    time("edges (repartition+dedup+persist)")(println(edges.count()))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d")).persist()
    time("deg")(println(deg.count()))
    val edgesDv = edges
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .select("u", "v", "dv").repartition(col("u")).persist()
    time("edgesDv (dest degree attach)")(println(edgesDv.count()))
    var score = deg.select(col("u"),
      expr("CAST(1000000000000 AS BIGINT)").as("s"), col("d"))
    for (i <- 1 to 3) {
      val contrib = score.select(col("u"), expr("s div d").as("c"))
      score = edgesDv.join(contrib, "u")
        .groupBy(col("v").as("u"), col("dv").as("d"))
        .agg(sum("c").as("inc"))
        .select(col("u"), expr("150000000000 + (17 * inc) div 20").as("s"),
          col("d")).persist()
      val s = score
      time(s"iter $i materialize")(s.count())
    }
    val fin = score.select(col("u"), col("s"))
      .orderBy(col("s").desc).limit(25)
    time("final top-k")(fin.collect())
    spark.stop()
  }
}
