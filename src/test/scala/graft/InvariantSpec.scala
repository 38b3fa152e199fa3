package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.matchers.should.Matchers

/** Cross-operator invariants over the fixtures (SURVEY §5 property layer):
  * window totals, set-op algebra, dedup bounds, plus ScalaCheck properties
  * for the pure helper arithmetic. */
class InvariantSpec extends SparkTestBase with Matchers {

  test("weighted sampler selects exactly the k smallest u/w priorities per stratum") {
    // Recompute the Sequential-Poisson selection driver-side from the raw
    // table with independent Scala code (MessageDigest md5, BigInt parse)
    // and assert the query returns exactly that set — proving the sampler
    // is a pure function of the data, not of partitioning or RNG state.
    val dir = sf()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("lang", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def u(docId: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.toSeq.map { case (_, id, w) => (id, u(id) / math.max(w, 1L)) }
        .sortBy { case (id, xi) => (xi, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (lang, i + 1, id) }
    }.toSet
    val got = SparkEntry.queries("q_sample_weighted")(spark, dir)
      .select("lang", "rk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("windowed counts conserve events: tumbling=1x, sliding=2x, session=1x") {
    val n = graft.sources.Tables.events(spark, sf()).count()
    val dir = sf()
    def total(q: graft.Q, cntCol: String): Long =
      q.fn(spark, dir).agg(sum(cntCol)).head().getLong(0)
    assert(total(graft.streaming.Streams.q35, "cnt") === n)
    assert(total(graft.streaming.Streams.q36, "cnt") === 2 * n)
    assert(total(graft.streaming.Streams.q37, "n_events") === n)
  }

  test("set-op algebra: |A intersect B| + |A except B| == |A|") {
    def active(yr: Int) = graft.sources.Tables.orders(spark, sf())
      .filter(year(col("o_orderdate")) === yr).select("o_custkey").distinct()
    val a = active(1996)
    val b = active(1997)
    assert(a.intersect(b).count() + a.except(b).count() === a.count())
  }

  test("exact dedup survivor count per lang is bounded by doc count") {
    val dir = sf()
    val perLang = graft.operators.TextOps.q31.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, survivors) =>
      assert(survivors <= docs(lang))
      assert(survivors > 0)
    }
  }

  test("unpivot is the exact inverse of the wide projection") {
    // melt(wide) must reproduce every (key, attr, value) cell exactly
    val dir = sf()
    val wide = graft.sources.Tables.part(spark, dir)
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"), col("p_retailprice").as("retail"),
        col("p_size").cast("double").as("size"))
    val long = wide.unpivot(Array(col("p_partkey")),
      Array(col("retail"), col("size")), "attr", "val")
    assert(long.count() === 2 * wide.count())
    val back = long.groupBy("p_partkey")
      .pivot("attr", Seq("retail", "size")).agg(first("val"))
      .select("p_partkey", "retail", "size")
    assert(back.except(wide).count() === 0 && wide.except(back).count() === 0)
  }

  test("int8 quantization error is bounded by half a quantization step") {
    // |dequant(q) - x| <= mxa/127/2 (+ float slack) for every vector
    val dir = sf()
    val bad = graft.sources.Tables.embeddings(spark, dir)
      .withColumn("mxa",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("err", expr(
        """array_max(zip_with(
          |  transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mxa + 0.5d) AS INT)),
          |  embedding,
          |  (q, x) -> abs(CAST(q AS DOUBLE) * mxa / 127.0 - CAST(x AS DOUBLE))))""".stripMargin))
      .filter(col("err") > col("mxa") / 127.0 / 2.0 + 1e-9)
      .count()
    assert(bad === 0L)
  }

  test("the graded inventory has unique names and total ordering per query") {
    val qs = SparkEntry.allQ
    assert(qs.map(_.name).distinct.size === qs.size, "duplicate query name shadows another in SparkEntry.queries")
    assert(SparkEntry.queries.size === qs.size)
    // every oracle references only fixture tables (no temp/external names)
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    qs.flatMap(_.oracle).foreach { sql =>
      assert(!sql.contains("read_parquet"), "oracle must use bare table names")
    }
    // q_agg_approx, q_agg_approx_quantile, q_agg_sketch_merge (sketch
    // estimates differ across engines by design), q_vec_pca_power
    // (eigenvector — not SQL-expressible); every other query MUST carry
    // an oracle
    assert(qs.count(_.oracle.isEmpty) === 4)
  }

  test("token-budget apportionment sums exactly to the budget") {
    val out = graft.operators.Curation.qDocMixBudget.fn(spark, sf()).collect()
    assert(out.map(_.getLong(2)).sum === 1000000L)
    // proportionality: every alloc is within 1 of its exact quota
    val toks = out.map(_.getLong(1))
    val total = toks.sum.toDouble
    out.foreach { r =>
      val exact = r.getLong(1) * 1000000L / total
      assert(math.abs(r.getLong(2) - exact) <= 1.0 + 1e-9,
        s"${r.getString(0)} alloc ${r.getLong(2)} vs exact quota $exact")
    }
  }

  test("retention matrix: offset 0 counts every cohort member exactly once") {
    val dir = sf()
    val m = graft.operators.Curation.qEventsRetention.fn(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val cohortSizes = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(min(to_date(date_trunc("day", col("ts")))).as("cohort"))
      .groupBy("cohort").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    cohortSizes.foreach { case (day, n) =>
      assert(m((day, 0)) === n, s"cohort $day day-0 retention must equal its size")
    }
    // monotone bound: no offset can retain more users than the cohort has
    m.foreach { case ((day, _), n) => assert(n <= cohortSizes(day)) }
  }

  test("band decomposition never misses a pair within its hamming radius (ScalaCheck)") {
    // pigeonhole: 4 bands, radius 3 — flipping <= 3 of 60 bits can touch
    // at most 3 bands, so at least one 15-bit band stays identical. This
    // is the guarantee q_dedup_simhash_wide's candidate join relies on.
    val gen = for {
      sh <- Gen.chooseNum(0L, (1L << 60) - 1)
      nFlips <- Gen.chooseNum(0, 3)
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 59))
    } yield (sh, flips)
    val prop = forAll(gen) { case (sh, flips) =>
      val other = flips.foldLeft(sh)((v, k) => v ^ (1L << k))
      (0 until 4).exists { b =>
        ((sh >> (b * 15)) & 32767L) == ((other >> (b * 15)) & 32767L)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("Det units/exactSum round-trip is exact for 2dp money (ScalaCheck)") {
    val cents = Gen.chooseNum(-999999999L, 999999999L)
    val prop = forAll(cents) { c =>
      val money = c / 100.0 // any 2dp value
      math.round(money * 100) == c
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("frame sampling arithmetic properties (ScalaCheck)") {
    val gen = for {
      n <- Gen.chooseNum(0, 10000)
      k <- Gen.chooseNum(1, 100)
      cap <- Gen.chooseNum(0, 200)
    } yield (n, k, cap)
    val prop = forAll(gen) { case (n, k, cap) =>
      val s = graft.operators.Multimodal.sampleFrameIndexes(n, k, cap)
      s.size <= cap && s.forall(i => i >= 0 && i < math.max(n, 1)) &&
        s == s.sorted && s.distinct == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("SCD2 intervals chain without gaps and close exactly once per key") {
    val dir = sf()
    val scd = graft.operators.OlapExtras.qCdcScd2.fn(spark, dir)
    val orders = graft.sources.Tables.orders(spark, dir)
    // every change event becomes exactly one versioned row
    assert(scd.count() === orders.count())
    // exactly one open (is_current) version per key, and it is the only
    // row with a NULL valid_to
    val perKey = scd.groupBy("o_custkey")
      .agg(sum("is_current").as("n_open"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_null_to"))
    assert(perKey.filter(col("n_open") =!= 1 || col("n_null_to") =!= 1)
      .count() === 0)
    // the chain is gapless: row k's valid_to == row k+1's valid_from.
    // Null-SAFE comparison: a plain =!= is null-valued (row dropped) when
    // valid_to is NULL mid-chain — exactly the open-interval-in-the-middle
    // bug class this check exists to catch.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    val gaps = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        !(col("valid_to") <=> col("next_from")))
    assert(gaps.count() === 0, "interval chain has a gap or overlap")
  }

  test("nearest as-of pick is never farther than either directional as-of") {
    val dir = sf()
    val near = graft.operators.Joins.qJoinAsofNear.fn(spark, dir)
      .select(col("event_id"), col("ts"), col("nearest_click_ts"), col("direction"))
    val back = graft.operators.Joins.q12.fn(spark, dir)
      .select(col("event_id"), col("prev_click_ts"))
    val fwd = graft.operators.Joins.qJoinAsofFwd.fn(spark, dir)
      .select(col("event_id"), col("next_click_ts"))
    val joined = near.join(back, "event_id").join(fwd, "event_id")
      .select(col("*"),
        abs(unix_micros(col("ts")) - unix_micros(col("nearest_click_ts"))).as("dn"),
        abs(unix_micros(col("ts")) - unix_micros(col("prev_click_ts"))).as("dp"),
        abs(unix_micros(col("ts")) - unix_micros(col("next_click_ts"))).as("df"))
    // the nearest pick is one of the two directional candidates, and at
    // least as close as each of them (null-safe: a missing side never wins)
    assert(joined.filter(col("nearest_click_ts").isNotNull &&
      !(col("nearest_click_ts") <=> col("prev_click_ts")) &&
      !(col("nearest_click_ts") <=> col("next_click_ts"))).count() === 0)
    assert(joined.filter(col("dp").isNotNull && col("dn") > col("dp")).count() === 0)
    assert(joined.filter(col("df").isNotNull && col("dn") > col("df")).count() === 0)
    // ties resolve backward
    assert(joined.filter(col("dp") === col("df") && col("dp").isNotNull &&
      col("direction") =!= "prev").count() === 0)
  }

  test("merge upsert partitions rows into inserted/updated/unchanged exactly") {
    val dir = sf()
    val merged = graft.operators.OlapExtras.qMergeUpsert.fn(spark, dir)
      .persist()
    val base = graft.sources.Tables.customer(spark, dir)
    val byAction = merged.groupBy("merge_action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every base row survives (as updated or unchanged), every new key
    // inserts, and the total is base + inserted — MERGE loses nothing
    assert(byAction.getOrElse("updated", 0L) +
      byAction.getOrElse("unchanged", 0L) === base.count())
    assert(merged.count() ===
      base.count() + byAction.getOrElse("inserted", 0L))
    // keys stay unique after the merge (the upsert is keyed, not appending)
    assert(merged.select("key").distinct().count() === merged.count())
    // action semantics: inserted rows carry a change payload, unchanged
    // rows carry none
    assert(merged.filter(col("merge_action") === "inserted" &&
      col("status").isNull).count() === 0)
    assert(merged.filter(col("merge_action") === "unchanged" &&
      col("status").isNotNull).count() === 0)
    merged.unpersist()
  }

  test("doc chunks tile the token stream: count and sizes match the grid") {
    // start grid = 0, 48, 96, ... <= n-1; chunk c holds min(64, n - 48c)
    // tokens. With stride < window every token is covered by >= 1 chunk.
    val dir = sf()
    val expected = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), expr("size(split(text, ' '))").as("n"))
      .select(col("doc_id"), col("n"),
        (floor((col("n") - 1) / 48) + 1).cast("int").as("exp_chunks"))
    val got = graft.operators.PipelineOps.qDocChunk.fn(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        max("n_tok").as("max_tok"), min("n_tok").as("min_tok"))
    val joined = got.join(expected, "doc_id")
    assert(joined.filter(col("n_chunks") =!= col("exp_chunks")).count() === 0)
    assert(joined.filter(col("max_tok") > 64 || col("min_tok") < 1).count() === 0)
    // per-chunk size formula: n_tok(c) == least(64, n - 48c), every chunk
    val sized = graft.operators.PipelineOps.qDocChunk.fn(spark, dir)
      .join(expected.select("doc_id", "n"), "doc_id")
      .filter(col("n_tok") =!=
        least(lit(64), col("n") - col("chunk_id") * 48))
    assert(sized.count() === 0)
  }

  test("stream-dedup survivors are exactly one earliest row per key") {
    val dir = sf()
    val out = graft.streaming.Streams.qStreamDedup.fn(spark, dir)
    val events = graft.sources.Tables.events(spark, dir)
    assert(out.count() ===
      events.select("user_id", "event_type").distinct().count())
    // each survivor carries its key's minimum timestamp
    val mins = events.groupBy("user_id", "event_type")
      .agg(min("ts").as("min_ts"))
    assert(out.join(mins, Seq("user_id", "event_type"))
      .filter(col("first_ts") =!= col("min_ts")).count() === 0)
  }

  test("sessionize conserves events and numbers sessions contiguously") {
    val dir = sf()
    val s = graft.operators.Curation.qEventsSessionize.fn(spark, dir)
      .persist()
    try {
      val events = graft.sources.Tables.events(spark, dir)
        .filter(col("user_id") < 200)
      // every event lands in exactly one session
      assert(s.agg(sum("n_events")).head().getLong(0) === events.count())
      // per user, session_seq runs 1..k with no holes
      val perUser = s.groupBy("user_id")
        .agg(min("session_seq").as("lo"), max("session_seq").as("hi"),
          count(lit(1)).as("n"))
      assert(perUser.filter(col("lo") =!= 1 || col("hi") =!= col("n"))
        .count() === 0)
      // a session of n events spans at most n-1 full idle gaps
      assert(s.filter(col("duration_us") >
        (col("n_events") - 1) * 1800000000L).count() === 0)
    } finally s.unpersist()
  }

  test("attribution partitions purchases exactly across channels") {
    val dir = sf()
    val at = graft.operators.Curation.qEventsAttribution.fn(spark, dir)
    val events = graft.sources.Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
    // every purchase is credited exactly once
    assert(at.agg(sum("n_purchases")).head().getLong(0) === purchases.count())
    // revenue conserves in exact cents
    assert(at.agg(sum("revenue_cents")).head().getLong(0) ===
      purchases.agg(sum(round(col("value") * 100).cast("bigint")))
        .head().getLong(0))
    // channels are only event types (or 'direct'), never 'purchase' itself
    val channels = at.select("channel").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(!channels.contains("purchase"))
    assert(channels.subsetOf(Set("click", "view", "signup", "error", "direct")))
  }

  test("pagerank scores stay in the exact integer-unit envelope") {
    val dir = sf()
    val pr = graft.operators.GraphOps.qGraphPagerank.fn(spark, dir)
    val rows = pr.collect()
    assert(rows.length === 25)
    // every score carries at least the teleport mass and no node can
    // exceed the graph's total initial mass (floor division only loses)
    val nNodes = {
      val li = graft.sources.Tables.lineitem(spark, dir)
      val ord = graft.sources.Tables.orders(spark, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("n"))
        .union(li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).as("n")))
        .distinct().count()
    }
    val totalMass = nNodes * 1000000000000L
    rows.foreach { r =>
      val s = r.getAs[Long]("score_units")
      assert(s >= 150000000000L, s"score below teleport floor: $s")
      assert(s <= totalMass, s"score exceeds total mass: $s")
    }
    // integer arithmetic is partition-order independent: a run under a
    // different shuffle-partition count returns byte-identical rows
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    val shuffled = graft.operators.GraphOps.qGraphPagerank.fn(alt, dir).collect()
    assert(shuffled.toSeq === rows.toSeq)
    // suppliers are the dense side of the bipartite graph: the top of the
    // ranking must be supplier-typed
    assert(rows.head.getAs[String]("node_type") === "supplier")
  }

  test("dup-mass island merge equals the brute-force position union (ScalaCheck)") {
    // The one piece of q_doc_dup_mass the oracle can't independently
    // falsify (both engines run the same window recipe) is the interval
    // algebra itself: covered == |union of [p, p+4] over duplicated
    // shingle starts|, with overlaps counted once. Brute-force the union
    // on random tiny corpora from an 8-token alphabet (dense collisions)
    // and compare row-for-row.
    val spk = spark
    import spk.implicits._
    val genDoc = for {
      n <- Gen.chooseNum(5, 25)
      toks <- Gen.listOfN(n, Gen.chooseNum(0, 7).map(i => s"w$i"))
    } yield toks
    val genCorpus = for {
      nDocs <- Gen.chooseNum(3, 8)
      docs <- Gen.listOfN(nDocs, genDoc)
    } yield docs
    val prop = forAll(genCorpus) { docs =>
      val dir = java.nio.file.Files.createTempDirectory("graft_dm_prop").toString
      docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" "), "en", "src0", t.mkString(" ").length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = graft.operators.CorpusStats.qDocDupMass.fn(spk, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      graft.sources.Scratch.releaseAll()
      // brute force: duplicated 5-grams = those in >= 2 distinct docs
      val grams = docs.zipWithIndex.flatMap { case (t, i) =>
        t.sliding(5).filter(_.size == 5).zipWithIndex
          .map { case (g, p) => (i.toLong, p, g.mkString(" ")) }
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expected = docs.zipWithIndex.collect {
        case (t, i) if t.size >= 5 =>
          val covered = grams.collect {
            case (d, p, g) if d == i.toLong && dup(g) => p until (p + 5)
          }.flatten.toSet.size
          i.toLong -> ((t.size.toLong, covered.toLong))
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge-stream final state is argmax-seq; stale replay never regresses") {
    val dir = sf()
    val out = SparkEntry.queries("q_merge_stream")(spark, dir).collect()
    val keys = out.map(_.getAs[Number]("key").longValue)
    assert(keys.distinct.length === keys.length, "upsert key uniqueness")
    // seq 2 = the credit reset: only positive (pre-existing) keys, bal 0
    out.filter(_.getAs[Int]("seq") == 2).foreach { r =>
      assert(r.getAs[Double]("bal") === 0.0)
      assert(r.getAs[Number]("key").longValue > 0)
    }
    // negative keys exist only via the batch-1 insert path (seq 1); a
    // replay regression would have re-labeled some back to stale values
    assert(out.filter(_.getAs[Number]("key").longValue < 0)
      .forall(_.getAs[Int]("seq") == 1))
    // cardinality: every customer survives; every odd ordering custkey
    // inserts exactly one negated key
    val nCust = graft.sources.Tables.customer(spark, dir).count()
    val nOdd = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_custkey") % 2 === 1)
      .select("o_custkey").distinct().count()
    assert(out.length === nCust + nOdd)
  }

  test("bucketed-sink join conserves joined rows across the round-trip") {
    val dir = sf()
    val out = SparkEntry.queries("q_sink_bucketed_join")(spark, dir).collect()
    val expected = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out.map(_.getAs[Long]("n_items")).sum === expected)
    assert(out.forall { r =>
      val b = r.getAs[Number]("bucket").longValue; b >= 0 && b < 16
    })
  }

  test("lm-filter tertiles conserve the scored corpus and stay balanced") {
    // Every scored doc (>= 2 tokens) lands in exactly one band; ntile
    // bands within a language differ in size by at most one; bands are
    // ordered by nll (band 1's max <= band 2's min, etc. up to the
    // rounded-score tie at the boundary).
    val dir = sf()
    val out = SparkEntry.queries("q_doc_lm_filter")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    val scored = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.size(split(col("text"), " ")) >= 2).count()
    assert(out.map(_._3).sum === scored,
      "banding lost or duplicated scored documents")
    out.groupBy(_._1).foreach { case (lang, bands) =>
      val sizes = bands.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$lang tertiles unbalanced: ${sizes.mkString(",")}")
      val sorted = bands.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, hiMax), (_, _, _, loMin, _)) =>
          assert(hiMax <= loMin,
            s"$lang band boundaries out of order: $hiMax > $loMin")
        case _ =>
      }
    }
  }

  test("semdedup never drops a cluster's keeper; counts partition members") {
    val dir = sf()
    val out = SparkEntry.queries("q_dedup_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (cid, n, nd) =>
      assert(nd < n, s"cluster $cid dropped all $n members (keep-first " +
        "guarantees the smallest id survives)")
      assert(nd >= 0 && n > 0)
    }
    // clusters partition the validated corpus. forall, not !exists(>1):
    // for a NaN component abs(x) > 1 is false AND abs(x) <= 1 is false,
    // so only the forall form matches cleanEmbeddings' exclusion.
    val valid = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64 &&
        forall(col("embedding"),
          x => org.apache.spark.sql.functions.abs(x) <= 1.0f))
      .count()
    assert(out.map(_._2).sum === valid,
      "cluster membership does not partition the validated corpus")
  }

  test("hybrid search ranks are candidate-bounded and rrf recomputes exactly") {
    val dir = sf()
    val out = SparkEntry.queries("q_hybrid_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.length === 10)
    out.foreach { case (id, rt, rv, rrf) =>
      assert(rt >= 1 && rt <= 50 && rv >= 1 && rv <= 50,
        s"doc $id carries an out-of-candidate-set rank ($rt, $rv)")
      val expect = BigDecimal(1.0 / (60 + rt) + 1.0 / (60 + rv))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf === expect, s"doc $id rrf $rrf != recomputed $expect")
    }
    // fused ordering is by (rrf desc, doc_id) — already the output order
    val resorted = out.sortBy { case (id, _, _, rrf) => (-rrf, id) }
    assert(out.toSeq === resorted.toSeq, "output violates the fused ordering")
  }

  test("bm25 top-10 matches an independent driver-side recompute") {
    // Recompute Okapi BM25 (Lucene +1 idf, k1=1.2, b=0.75, micro-unit
    // quantization per (doc, term) BEFORE the cross-term sum) from the raw
    // table with plain Scala, and assert the query returns exactly that
    // ranking — proving the score is a pure function of the corpus.
    val dir = sf()
    val terms = Set("data", "query", "vector")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toDouble).sum / docs.length
    val tf = docs.flatMap { case (id, tk) =>
      tk.filter(terms).groupBy(identity).map { case (t, xs) =>
        ((id, t), xs.length.toDouble)
      }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toDouble }
    val dl = docs.map { case (id, tk) => id -> tk.length.toDouble }.toMap
    val scoreU = tf.toSeq.map { case ((id, t), f) =>
      val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
      val s = idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      id -> math.round(s * 1000000)
    }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum }
    val expected = scoreU.toSeq.sortBy { case (id, u) => (-u, id) }.take(10)
      .map { case (id, u) => (id, u / 1000000.0) }
    val got = SparkEntry.queries("q_text_bm25")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("bitext margins match a driver-side brute-force recompute") {
    // Rebuild the full cross-slice similarity matrix in plain Scala
    // (same ascending-order double accumulation as graft_dot), apply the
    // micro-unit rank/margin arithmetic, and require the exact output.
    val dir = sf()
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64 &&
        expr("forall(embedding, x -> abs(x) <= 1.0d)"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def u6(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qa = vecs.filter(_._3 < 5)
    val qb = vecs.filter(_._3 >= 5)
    val expected = qa.flatMap { case (aId, av, _) =>
      val sims = qb.map { case (bId, bv, _) =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += av(i).toDouble * bv(i).toDouble; i += 1 }
        (bId, u6(acc))
      }.sortBy { case (bId, u) => (-u, bId) }
      val (bestB, bestU) = sims.head
      val nxt = sims.slice(1, 5)
      if (nxt.length == 4) {
        val den = nxt.map(_._2).sum
        if (bestU > 0 && den > 0) {
          val margin = BigDecimal(bestU * 4.0 / den)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (margin >= 1.2)
            Some((aId, bestB, bestU / 1000000.0, margin))
          else None
        } else None
      } else None
    }.sortBy { case (aId, _, _, m) => (-m, aId) }.toSeq
    val got = SparkEntry.queries("q_bitext_mine")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("duplicated-substring spans match a driver-side brute-force recompute") {
    // Recompute ExactSubstr spans with independent Scala: every width-40
    // substring seen in >= 2 distinct docs marks its position, consecutive
    // positions merge to maximal spans. The distributed gram-index +
    // gaps-and-islands form must return exactly this set.
    val dir = sf()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val L = 40
    val gramDocs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, t) =>
      (0 to t.length - L).foreach { i =>
        gramDocs.getOrElseUpdate(t.substring(i, i + L), scala.collection.mutable.Set.empty) += id
      }
    }
    val dup = gramDocs.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    val expected = docs.flatMap { case (id, t) =>
      val pos = (0 to t.length - L).filter(i => dup(t.substring(i, i + L)))
      // merge consecutive positions into maximal islands
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var s = -2; var prev = -2
      (pos :+ Int.MaxValue).foreach { i =>
        if (i != prev + 1) {
          if (s >= 0) spans += ((id, s + 1L, prev - s + L.toLong)) // 1-based
          s = i
        }
        prev = i
      }
      spans
    }.toSet
    val got = SparkEntry.queries("q_dedup_substring")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // spans stay inside the doc and meet the minimum width. (Overlapping
    // spans ARE legal: duplicated positions {i, i+2} with i+1 clean form
    // two islands whose 40-char ranges overlap — so no overlap assert.)
    val byDoc = got.toSeq.groupBy(_._1)
    val lenOf = docs.toMap
    byDoc.foreach { case (id, ss) =>
      ss.foreach { case (_, start, len) =>
        assert(start >= 1 && start + len - 1 <= lenOf(id).length,
          s"doc $id span [$start, +$len) exceeds text bounds")
        assert(len >= L, "span below width L")
      }
    }
  }

  test("incremental substring spans are contained in the full row's spans") {
    // Batch-vs-corpus duplication is a SUBSET of all-corpus duplication:
    // every incremental span (batch doc probing corpus grams) must lie
    // inside some span the full q_dedup_substring row reports for the
    // same doc — the full row additionally sees in-batch duplication, so
    // containment (not equality) is the invariant.
    val dir = sf()
    val full = SparkEntry.queries("q_dedup_substring")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val inc = SparkEntry.queries("q_dedup_substring_inc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(inc.nonEmpty, "fixture has no batch-vs-corpus duplicated spans")
    inc.foreach { case (id, s, l) =>
      assert(id % 5 === 4, s"doc $id is not in the batch slice")
      val covers = full.getOrElse(id, Array.empty).exists { case (_, fs, fl) =>
        fs <= s && s + l <= fs + fl
      }
      assert(covers, s"inc span doc=$id [$s, +$l) not inside any full span")
    }
  }

  test("bpe apply merge counts match a driver-side replace recompute") {
    // Recompute the winning pair and its non-overlapping left-to-right
    // merge count per language with plain Scala string ops — the
    // length-arithmetic occ formula must equal an explicit scan.
    val dir = sf()
    // CODE-POINT arrays, not UTF-16 chars: Spark length()/substring() and
    // DuckDB len()/substr() count code points, and pair tie-break order
    // is by code point (= UTF-8 binary order) — Java String .length/
    // .substring/.compareTo would diverge on supplementary-plane text.
    def cps(w: String): Array[Int] = w.codePoints().toArray
    val words = graft.sources.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .flatMap { r => r.getString(1).split(" ")
        .map(cps).filter(_.length >= 2).map(w => (r.getString(0), w.toSeq)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def occNonOverlap(w: Seq[Int], p: (Int, Int)): Long = {
      var i = 0; var n = 0L
      while (i <= w.length - 2) {
        if (w(i) == p._1 && w(i + 1) == p._2) { n += 1; i += 2 } else i += 1
      }
      n
    }
    val byLang = words.toSeq.groupBy(_._1._1)
    val expected = byLang.map { case (lang, ws) =>
      val pairCnt = scala.collection.mutable.Map.empty[(Int, Int), Long]
      ws.foreach { case ((_, w), f) =>
        (0 until w.length - 1).foreach { i =>
          val p = (w(i), w(i + 1))
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + f
        }
      }
      val top = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.head._1
      val merges = ws.map { case ((_, w), f) => f * occNonOverlap(w, top) }.sum
      lang -> (new String(Array(top._1, top._2), 0, 2), merges)
    }
    val got = SparkEntry.queries("q_token_bpe_apply")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(got === expected)
  }

  test("bpe trainer trajectory is non-increasing and merge-consistent") {
    // Each merge replaces a 2-symbol pair with 1 symbol in a FIXED word
    // multiset, so the freq-weighted avg tokens/word must never rise
    // across iterations, every round must actually merge something on
    // this fixture, and round 1 must agree with the single-step
    // q_token_bpe_apply row (same corpus, same win rule; the trainer's
    // reserved-char dictionary filter excludes nothing here).
    val dir = sf()
    val rows = SparkEntry.queries("q_token_bpe_train")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byIt = rs.sortBy(_._2)
      assert(byIt.map(_._2).toSeq === (1 to byIt.length),
        s"$lang: missing iteration rows")
      byIt.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._5 <= a._5,
            s"$lang: avg tokens/word rose ${a._5} -> ${b._5} at it ${b._2}")
        case _ =>
      }
      byIt.foreach { r =>
        assert(r._4 > 0, s"$lang it ${r._2}: zero merges on the fixture")
      }
    }
    val apply1 = SparkEntry.queries("q_token_bpe_apply")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(4))).toMap
    rows.filter(_._2 == 1).foreach { case (lang, _, pair, nMerges, _) =>
      assert(apply1(lang)._1 === pair,
        s"$lang: trainer round-1 pair differs from q_token_bpe_apply")
      assert(apply1(lang)._2 === nMerges,
        s"$lang: trainer round-1 merge count differs from q_token_bpe_apply")
    }
  }

  test("kmeans iterations conserve the clean corpus and shrink assignment energy") {
    // Both rounds' cluster sizes must each sum to the clean corpus size
    // (every vector assigned exactly once per iteration), and the
    // centroid shift must be a finite non-negative squared distance.
    val dir = sf()
    val out = SparkEntry.queries("q_vec_kmeans_iter")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val clean = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64 &&
        expr("forall(embedding, x -> abs(x) <= 1.0d)"))
      .count()
    // n2 is the true conservation invariant: every clean vector is in
    // exactly one round-2 cluster and every round-2 cluster is in the
    // output. n1 only bounds it — a cluster that EMPTIES in round 2 is
    // dropped by the c1 join c2 contract (on both engines), taking its
    // round-1 members out of the reported n1 sum.
    assert(out.map(_._3).sum === clean, "iteration-2 sizes lose/duplicate vectors")
    assert(out.map(_._2).sum <= clean, "iteration-1 sizes exceed the clean corpus")
    out.foreach { case (cid, _, _, shift) =>
      assert(shift >= 0.0 && shift <= 256.0 && !shift.isNaN,
        s"cluster $cid shift $shift out of bounds")
    }
  }

  test("pq adc top-5 matches a driver-side quantize-and-rank recompute") {
    // Independent plain-Scala PQ: split, seed, one Lloyd step with 1e-9
    // integer-unit means, re-encode, integer-unit LUT, ADC sum, top-5.
    // Proves the distributed pipeline is a pure function of the data.
    val dir = sf()
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64 &&
        expr("forall(embedding, x -> abs(x) <= 1.0d)"))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val m = 16; val sub = 4; val ks = 32
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sv(v: Array[Float], s: Int): Array[Double] =
      Array.tabulate(sub)(j => v(s * sub + j).toDouble)
    val seeds = vecs.filter(_._1 < ks).sortBy(_._1)
    // one Lloyd step: assign every subvector to its nearest seed
    def nearest(x: Array[Double], book: Seq[(Int, Array[Double])]): Int =
      book.map { case (c, cv) =>
        (r6(x.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum), c)
      }.min._2
    val trained: Map[Int, Seq[(Int, Array[Double])]] =
      (0 until m).map { s =>
        val book0 = seeds.map { case (id, v) => (id.toInt, sv(v, s)) }.toSeq
        val asg = vecs.map { case (id, v) => (nearest(sv(v, s), book0), sv(v, s)) }
        s -> asg.groupBy(_._1).toSeq.map { case (c, xs) =>
          val n = xs.length
          val mean = Array.tabulate(sub) { j =>
            xs.map { case (_, x) =>
              BigDecimal(x(j) * 1e9)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            }.sum / 1e9 / n
          }
          (c, mean)
        }
      }.toMap
    val codes = vecs.map { case (id, v) =>
      id -> Array.tabulate(m)(s => nearest(sv(v, s), trained(s)))
    }.toMap
    val expected = vecs.filter(_._1 < 20).flatMap { case (aId, av) =>
      val lut: Map[(Int, Int), Long] = (0 until m).flatMap { s =>
        trained(s).map { case (c, cv) =>
          val d = sv(av, s).zip(cv).map { case (a, b) => a * b }.sum
          (s, c) -> BigDecimal(d * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }.toMap
      codes.toSeq.filter(_._1 != aId).map { case (bId, cs) =>
        (bId, (0 until m).map(s => lut((s, cs(s)))).sum)
      }.sortBy { case (bId, u) => (-u, bId) }.take(5).zipWithIndex
        .map { case ((bId, u), i) => (aId, bId, r6(u / 1e6), i + 1) }
    }.toSet
    val got = SparkEntry.queries("q_vec_pq")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === expected)
  }

  test("ncc confusion matrix partitions the clean corpus; sims are cosine-bounded") {
    // Every clean vector is assigned to exactly one centroid, so the
    // row sums of the confusion matrix must equal the per-true-label
    // clean counts, and the grand total the clean corpus size. Cell
    // similarities are bounded by |a||b| <= dim (components in [-1,1]).
    val dir = sf()
    val out = SparkEntry.queries("q_vec_ncc")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val perLabel = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64 &&
        expr("forall(embedding, x -> abs(x) <= 1.0d)"))
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rowSums = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(rowSums === perLabel,
      "confusion row sums disagree with per-label clean counts")
    out.foreach { case (l, p, n, s) =>
      assert(n > 0, s"empty confusion cell ($l,$p) emitted")
      assert(math.abs(s) <= 64.0, s"cell ($l,$p) avg sim $s out of bound")
    }
  }

  test("bpe pair-merge candidates match a driver-side dictionary recompute") {
    // The word-frequency dictionary expansion must count exactly what a
    // direct scan over every word OCCURRENCE counts — the dictionary is
    // an optimization, not a semantics change.
    val dir = sf()
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (lang, text) =>
      text.split(" ", -1).foreach { w =>
        if (w.length >= 2)
          (0 until w.length - 1).foreach { i =>
            val p = w.substring(i, i + 2)
            counts((lang, p)) = counts.getOrElse((lang, p), 0L) + 1L
          }
      }
    }
    val expected = counts.toSeq
      .map { case ((lang, p), c) => (lang, p, c) }
      .groupBy(_._1).toSeq.flatMap { case (_, ps) =>
        ps.sortBy { case (_, p, c) => (-c, p) }.take(8).zipWithIndex
          .map { case ((lang, p, c), i) => (lang, p, c, i + 1) }
      }.sortBy { case (lang, _, _, r) => (lang, r) }
    val got = SparkEntry.queries("q_token_pair_merge")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got === expected)
  }

  test("interval join matches a brute-force quadratic recompute") {
    // The bucketized decomposition (hour-bucket equi-join + max-start
    // bucket ownership) must return EXACTLY the pairs the naive O(n^2)
    // overlap scan finds — no pair lost at a bucket boundary, none
    // double-counted when two intervals share two buckets.
    val dir = sf()
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getString(2),
        r.getDouble(3)))
    def ivs(tpe: String, mod: Int) = ev.filter(_._3 == tpe).map {
      case (id, s, _, v) =>
        val u = math.round(v * 100)
        val dur = ((u % mod) + mod) % mod + 1
        (id, s, s.plusSeconds(dur * 60))
    }
    val a = ivs("purchase", 45)
    val b = ivs("error", 30)
    val pairs = for {
      (aid, as, ae) <- a
      (_, bs, be) <- b
      if !as.isAfter(be) && !bs.isAfter(ae)
    } yield (aid, as, ae, bs, be)
    val expected = pairs
      .groupBy { case (_, as, _, _, _) => as.truncatedTo(java.time.temporal.ChronoUnit.DAYS) }
      .map { case (day, ps) =>
        val overlapUs = ps.map { case (_, as, ae, bs, be) =>
          val st = if (as.isAfter(bs)) as else bs
          val en = if (ae.isBefore(be)) ae else be
          java.time.Duration.between(st, en).toNanos / 1000L
        }.sum
        (day, ps.length.toLong, ps.map(_._1).distinct.length.toLong, overlapUs)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_join_interval")(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
  }
}
