package graft

/** Per-process run identity, exported as the `graft.run.id` system property
  * BEFORE log4j2 initializes (every entry point — Bench, Verify, the tools,
  * SparkTestBase — references [[id]] ahead of its first SparkSession
  * build). log4j2.properties interpolates it into the fixture-stats file
  * appender's path, so two concurrent JVMs (or two users sharing one host,
  * where a fixed tmpdir path is not even openable by the second user and
  * log4j's StatusLogger would dump appender errors to stderr — the channel
  * the bench tail must keep to the JSON line only) each write their own
  * file. The pid is unique per live process on a host; stale files are
  * tmpdir litter the host reaper owns, like every other graft_rt artifact.
  */
object RunId {
  val id: String = sys.props.getOrElseUpdate(
    "graft.run.id", java.lang.ProcessHandle.current().pid().toString)

  /** Force the export from statement position without a discarded-value
    * warning. */
  def ensure(): Unit = { val _ = id }
}
