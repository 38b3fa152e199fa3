package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites: same conf shape as Verify/Bench
  * (UTC, small shuffle partitions, nanos workaround) so tests exercise the
  * graded configuration, just smaller.
  *
  * The session is rebuildable (not a one-shot lazy val) because
  * ExtensionsSpec must stop the shared SparkContext to prove the
  * spark.sql.extensions plugin path — that conf is STATIC, read from the
  * context's conf at session construction, so it can only be exercised on
  * a fresh context. Suites run sequentially (build.sbt pins
  * Test/parallelExecution := false) so a rebuild never races another suite.
  */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkTestBase {
  @volatile private var _session: SparkSession = _

  private def build(): SparkSession = {
    RunId.ensure() // export graft.run.id before the session's first log4j use
    SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  }

  def session: SparkSession = synchronized {
    if (_session == null || _session.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      _session = build()
    }
    _session
  }
}
