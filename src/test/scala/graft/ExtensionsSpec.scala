package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must register every native function into a session
  * built with spark.sql.extensions — the plugin path a library user
  * configures. That conf is STATIC: it is read from the SparkContext's
  * conf when the session is constructed, so reusing the shared test
  * context can never exercise it (getOrCreate would return a session
  * whose context ignores the option). This test therefore stops the
  * shared context and builds a genuinely fresh one with the extension
  * applied. There is no fallback registration: if the plugin entry point
  * breaks, this fails. The shared session is rebuilt lazily by whichever
  * suite runs next (SparkTestBase.session checks isStopped). */
class ExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    SparkTestBase.session.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // No register() calls anywhere here — the plugin alone provides these.
      assert(s2.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
        .head().getDouble(0) === 2.0)
      // squared L2 against a FLOAT and a DOUBLE right side (the codebook
      // types PQ encode sees before and after Lloyd training)
      assert(s2.sql(
        "SELECT graft_l2(array(CAST(1.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
        .head().getDouble(0) === 4.0)
      assert(s2.sql(
        "SELECT graft_l2(array(CAST(1.0 AS FLOAT)), array(CAST(4.0 AS DOUBLE)))")
        .head().getDouble(0) === 9.0)
      // single hash: the majority vote reproduces that hash's low 16 bits
      assert(s2.sql("SELECT graft_simhash16(array(CAST(3 AS BIGINT)))")
        .head().getLong(0) === 3L)
      assert(s2.sql("SELECT size(graft_minhash_sig(array(CAST(1 AS BIGINT))))")
        .head().getInt(0) === 16)
      assert(s2.sql(
        "SELECT graft_bitmap_and_count(array(CAST(7 AS BIGINT)), array(CAST(5 AS BIGINT)))")
        .head().getInt(0) === 2) // popcount(7 & 5) = popcount(0b101) = 2
      // Bloom pair via the plugin: a member must test positive
      s2.range(0, 50).selectExpr("id AS k").createOrReplaceTempView("ext_bloom_keys")
      assert(s2.sql(
        """SELECT graft_might_contain(
          |  (SELECT graft_bloom_agg(xxhash64(k), 50L, 800L) FROM ext_bloom_keys),
          |  xxhash64(25L))""".stripMargin)
        .head().getBoolean(0))
    } finally {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
