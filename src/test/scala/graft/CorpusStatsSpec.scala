package graft

import org.apache.spark.sql.functions._

/** Synthetic-invariant checks for the CorpusStats family — properties the
  * cross-engine hash compare can't express: novelty semantics on a known
  * duplicate, OOV on a fully-covered corpus, the Zipf slope's sign on a
  * Zipfian synthetic, and the z-order tile-span bound on real data.
  */
class CorpusStatsSpec extends SparkTestBase {

  import graft.operators.{CorpusStats, PipelineOps}

  test("q_doc_novelty: a verbatim duplicate has novelty 0, its original 1") {
    val spk = spark
    import spk.implicits._
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, text, "en"),
      (2L, text, "en"),                                    // exact re-read
      (3L, (31 to 60).map(i => s"w$i").mkString(" "), "en") // fresh content
    ).toDF("doc_id", "text", "lang")
    // the graded query reads Tables.documents, so rebuild its plan inline
    // here (same construction as CorpusStats.qDocNovelty, fixture-fed)
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    val w = Window.partitionBy("doc_id").orderBy("p")
    val sh = toks
      .withColumn("t1", lead("t", 1).over(w))
      .withColumn("t2", lead("t", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("s"))
      .dropDuplicates("doc_id", "s")
    val fo = sh.groupBy("s").agg(min("doc_id").as("first_doc"))
    val novel = when(col("first_doc") === col("doc_id"), 1).otherwise(0)
    val out = sh.join(fo, "s").groupBy("doc_id")
      .agg((sum(novel).cast("double") / count(lit(1))).as("novelty"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) === 1.0, "first occurrence must be fully novel")
    assert(out(2L) === 0.0, "verbatim duplicate must have zero novelty")
    assert(out(3L) === 1.0, "disjoint content must be fully novel")
  }

  test("q_text_oov: corpus vocab of <=500 tokens means zero OOV everywhere") {
    // sf0.001's fixture vocabulary is < 500 distinct tokens, so the
    // top-500 vocab covers it completely — every language's OOV rate
    // must be exactly 0 (the coverage join is then a no-op at scale).
    val distinctToks = graft.sources.Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    val out = CorpusStats.qTextOov.fn(spark, sf())
    val rates = out.select("oov_rate").collect().map(_.getDouble(0))
    if (distinctToks <= 500) assert(rates.forall(_ === 0.0),
      s"vocab covers the corpus but oov_rate=${rates.mkString(",")}")
    else assert(rates.forall(r => r >= 0.0 && r < 1.0))
  }

  test("q_text_zipf: slope is negative for every language on real data") {
    val slopes = CorpusStats.qTextZipf.fn(spark, sf())
      .select("lang", "zipf_slope").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(slopes.nonEmpty)
    slopes.foreach { case (lang, s) =>
      assert(s < 0.0, s"rank-frequency slope must fall for $lang, got $s")
    }
  }

  test("q_layout_zorder: every z-bucket is a 16x16 tile (span <= 15 both dims)") {
    val out = PipelineOps.qLayoutZorder.fn(spark, sf())
      .select(col("x_max") - col("x_min"), col("y_max") - col("y_min"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.nonEmpty)
    assert(out.forall { case (dx, dy) => dx <= 15 && dy <= 15 },
      "a z-bucket spanning more than its tile breaks min/max skipping")
  }

  test("MisraGries: summary keys superset all freq > n/capacity items, any merge order") {
    // Skewed synthetic stream: item i appears 2^(10-i) times for i in 0..9,
    // plus 400 singleton fillers to force evictions at capacity 16.
    val stream: Seq[String] =
      (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"hot$i")) ++
        (0 until 400).map(i => s"cold$i")
    val n = stream.size
    val cap = 16
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavies = truth.filter { case (_, c) => c > n.toLong / cap }.keySet
    // fold in three adversarial partition orders: sorted, reversed, interleaved
    val orders = Seq(stream.sorted, stream.sorted.reverse,
      stream.zipWithIndex.sortBy(_._2 % 7).map(_._1))
    orders.foreach { s =>
      val mg = new graft.functions.MisraGries(cap)
      // split into 8 chunks, reduce each, merge pairwise like a shuffle tree
      val parts = s.grouped(math.max(1, s.size / 8)).toSeq
        .map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = parts.reduce(mg.merge)
      assert(merged.size <= cap, "summary must stay bounded")
      assert(heavies.subsetOf(merged.keySet.toSet),
        s"MG lost a guaranteed heavy hitter: ${heavies -- merged.keySet}")
      // estimates never overcount
      merged.foreach { case (k, est) =>
        assert(est <= truth(k), s"$k overcounted: $est > ${truth(k)}")
      }
    }
  }

  test("q_text_heavy: sketch-then-verify equals the exact full groupBy") {
    val out = CorpusStats.qTextHeavy.fn(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // exact reference: full-width groupBy with the same threshold
    val spk = spark
    val tok = spk.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = tok.count()
    val exact = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 30 > lit(n))
      .orderBy(desc("cnt"), col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty, "threshold must keep the above-average tokens")
    assert(out.toSeq === exact.toSeq,
      "the MG candidate pass must not change the exact heavy-hitter set")
  }

  test("q_text_boilerplate: a planted template shingle is flagged, sparse sources stay clean") {
    val spk = spark
    import spk.implicits._
    // srcA: 5 docs all ending in the template bigram "visit again" (df=5,
    // 5·5 > 5 docs and df ≥ 3 → boilerplate). srcB: 2 docs sharing all
    // their shingles — df=2 fails the df ≥ 3 floor, so a tiny source can
    // never declare its whole vocabulary boilerplate.
    val docs = (
      (0 until 5).map(i => (i.toLong, s"alpha$i beta$i gamma$i visit again", "en", "srcA")) ++
        Seq((10L, "same words here", "en", "srcB"), (11L, "same words here", "en", "srcB"))
      ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.CorpusStats.qTextBoilerplate.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nDocsA, nShinglesA, nBoilerA) = out("srcA")
    assert(nDocsA === 5L)
    assert(nBoilerA === 1L, s"exactly the planted 'visit again' must be boilerplate, got $nBoilerA")
    assert(nShinglesA === 5L * 3 + 1, "4 bigrams per doc, 3 unique + 1 shared")
    val (_, _, nBoilerB) = out("srcB")
    assert(nBoilerB === 0L, "a 2-doc source cannot clear the df >= 3 floor")
  }

  test("q_doc_dup_mass: shared spans cover BOTH copies; overlaps never double count") {
    val spk = spark
    import spk.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-token shared block
    val docs = Seq(
      // docs 1 and 2: 5 unique tokens then the shared block → covered = 10 on BOTH
      (1L, (1 to 5).map(i => s"a$i").mkString(" ") + " " + shared, "en", "srcA"),
      (2L, (1 to 5).map(i => s"b$i").mkString(" ") + " " + shared, "en", "srcA"),
      // doc 3: fully disjoint content → covered = 0
      (3L, (1 to 15).map(i => s"c$i").mkString(" "), "en", "srcA"),
      // doc 4: the shared block twice back-to-back → one merged span of 20
      (4L, shared + " " + shared, "en", "srcA")
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_dupmass").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.CorpusStats.qDocDupMass.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((15L, 10L)), "first copy counts (unlike novelty)")
    assert(out(2L) === ((15L, 10L)), "second copy counts")
    assert(out(3L) === ((15L, 0L)), "disjoint doc has zero duplicated mass")
    // doc 4: every 5-gram inside the 20-token doubled block also occurs in
    // docs 1/2 or recurs across the seam; islands merge to full coverage
    // without double counting any position
    assert(out(4L)._2 <= 20L, "covered mass can never exceed the doc length")
    assert(out(4L)._2 === 20L, "back-to-back shared blocks merge into one span")
  }
}
