package graft.operators

import graft.sources.Scratch.PersistSyntax
import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Iterative graph ranking over relations — the crawl-prioritization /
  * source-weighting step of a training-data pipeline (rank domains or
  * accounts by link mass before sampling from them).
  *
  * PageRank here is DETERMINISTIC INTEGER-UNIT arithmetic: scores are
  * BIGINT "units" (1e12 per node at t=0), the damping factor 0.85 is the
  * exact rational 17/20 applied as `(17 * x) div 20`, and per-neighbor
  * contributions are `score div degree` — floor division on positives,
  * identical in Spark (`div`) and DuckDB (`//`). Every per-node sum is a
  * sum of longs, so partition order cannot perturb the result and the
  * driver's hash compare holds exactly. (Float PageRank would differ
  * across engines in the last ulps and is un-oracle-able by hash.)
  *
  * Scale shape: each iteration is one equi-join of the score vector with
  * the edge list on the source node plus one partial-aggregated groupBy
  * on the destination — the canonical distributed PageRank step. At
  * 100 TB you co-partition edges and scores on the node id so the join
  * is shuffle-free and only the aggregate moves data; hub skew (the
  * supplier side here is 15x denser) is absorbed by map-side combine,
  * which reduces each partition's contribution to one row per hub before
  * the shuffle. Three fixed iterations keep the plan depth static — for
  * rank-until-convergence, wrap with the same localCheckpoint-per-round
  * discipline as [[SketchDedup.connectedComponents]]. Long overflow
  * headroom: 17 * (total mass) must stay under 2^63, which holds through
  * ~5e17 units of mass, i.e. ~500k nodes at these unit sizes; shift to
  * DECIMAL(38,0) units past that.
  */
object GraphOps {

  /** Undirected customer<->supplier interaction graph from co-occurrence
    * in orders: node id = 2*custkey for customers, 2*suppkey+1 for
    * suppliers (disjoint id spaces without string keys). */
  private val unit = "1000000000000" // 1e12 score units per node at t=0
  private val teleport = "150000000000" // 0.15 * unit

  private def iterSql(i: Int, prev: String): String =
    s"""i$i AS (SELECT e.v AS u, CAST(SUM($prev.s // deg.d) AS BIGINT) AS inc
       |  FROM e JOIN $prev ON e.u = $prev.u JOIN deg ON e.u = deg.u
       |  GROUP BY e.v),
       |s$i AS (SELECT deg.u,
       |    CAST($teleport + (17 * COALESCE(i$i.inc, 0)) // 20 AS BIGINT) AS s
       |  FROM deg LEFT JOIN i$i ON deg.u = i$i.u)""".stripMargin

  val qGraphPagerank = Q(
    "q_graph_pagerank",
    s"""WITH p AS (SELECT DISTINCT o_custkey * 2 AS cu, l_suppkey * 2 + 1 AS sv
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT cu AS u, sv AS v FROM p UNION ALL SELECT sv, cu FROM p),
       |deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
       |s0 AS (SELECT u, CAST($unit AS BIGINT) AS s FROM deg),
       |${iterSql(1, "s0")},
       |${iterSql(2, "s1")},
       |${iterSql(3, "s2")}
       |SELECT CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  CAST(u // 2 AS BIGINT) AS node_key, s AS score_units
       |FROM s3
       |ORDER BY score_units DESC, node_type, node_key LIMIT 25""".stripMargin
  ) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("cu"),
        (col("l_suppkey") * 2 + 1).cast("long").as("sv"))
    // Dedup the DIRECTED pair list BEFORE symmetrizing: customer and
    // supplier ids live in disjoint (even/odd) spaces, so the mirrored
    // edges can never collide and distinct-on-(cu,sv) is exactly half the
    // dedup work of distinct-on-the-symmetrized-list. This is also the
    // shuffle-minimal build: the r10 shape symmetrized first and then
    // moved the FULL edge list twice (repartition+dedup, then again after
    // the degree-attach join) — profiled at sf0.1 those two 2|E|-row
    // exchanges plus the extra persist were ~4 of pagerank's 7 s. Here
    // the only full-edge-list shuffle is the final repartition(u).
    val pairs = raw.dropDuplicates("cu", "sv").persistScratch()
    // Per-side degrees from the pair list (count of distinct neighbors —
    // pairs is already distinct). Node-cardinality tables: Catalyst
    // auto-broadcasts them at bench scale; at 100 TB they exceed the
    // threshold and the joins below become shuffle joins on the same keys
    // the aggregate just produced — both plans are the scale shape.
    val degC = pairs.groupBy("cu").agg(count(lit(1)).as("dc")).persistScratch()
    val degS = pairs.groupBy("sv").agg(count(lit(1)).as("ds")).persistScratch()
    // Symmetrize and attach the DESTINATION degree in the same single
    // pass (explode emits both directions), so an iteration is one
    // edges⋈contributions equi-join + one destination-keyed aggregate
    // whose group key (v, dv) carries the degree into the next round —
    // never a per-round rejoin against deg. The left-join
    // COALESCE(inc, 0) of the oracle's formulation is structurally
    // unreachable here: the edge list is symmetric by construction, so
    // every node has an in-edge and appears in the aggregate.
    // The result is materialized PRE-PARTITIONED on u — the cached
    // partitioning satisfies each iteration's join requirement, so only
    // the (node-cardinality) score side shuffles per round, never the
    // edge list: the 100 TB co-partitioning discipline in local form.
    val edgesDv = pairs
      .join(degS, "sv").join(degC, "cu")
      .select(explode(array(
        struct(col("cu").as("u"), col("sv").as("v"), col("ds").as("dv")),
        struct(col("sv").as("u"), col("cu").as("v"), col("dc").as("dv"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .repartition(col("u"))
      .persistScratch()
    // Initial scores carry each node's OWN degree (the divisor of its
    // outgoing contribution): customers from degC, suppliers from degS.
    val deg = degC.select((col("cu")).as("u"), col("dc").as("d"))
      .unionByName(degS.select(col("sv").as("u"), col("ds").as("d")))
    var score = deg.select(col("u"), expr(s"CAST($unit AS BIGINT)").as("s"),
      col("d"))
    for (_ <- 1 to 3) {
      val contrib = score.select(col("u"), expr("s div d").as("c"))
      score = edgesDv.join(contrib, "u")
        .groupBy(col("v").as("u"), col("dv").as("d"))
        .agg(sum("c").as("inc"))
        .select(col("u"), expr(s"$teleport + (17 * inc) div 20").as("s"),
          col("d"))
    }
    score.select(
      when(col("u") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
        .as("node_type"),
      expr("u div 2").as("node_key"),
      col("s").as("score_units"))
      .orderBy(col("score_units").desc, col("node_type"), col("node_key"))
      .limit(25)
  }

  def all: Seq[Q] = Seq(qGraphPagerank)
}
