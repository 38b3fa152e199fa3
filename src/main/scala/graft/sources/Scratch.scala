package graft.sources

import org.apache.spark.sql.Dataset

/** Engine-managed scratch-cache registry. Operators persist shared
  * sub-DAGs (a bitmap table feeding both sides of a self-join, a
  * signature frame read by candidate-gen and verify, ...) through
  * [[Scratch.PersistSyntax.persistScratch]] instead of a bare
  * `persist()`, and a long-lived session (the bench, a REPL) releases
  * every query-scoped cache in one call with [[releaseAll]] without
  * touching [[Tables]]' warm table cache.
  *
  * Why track Datasets rather than sweep `sparkContext.getPersistentRDDs`:
  * `Dataset.unpersist()` drops BOTH the cached blocks and the session
  * CacheManager's logical-plan entry. Unpersisting the underlying RDDs
  * directly leaves the entry registered, and a later query whose plan
  * canonically matches it gets substituted with the dead
  * InMemoryRelation — its own `persist()` becomes a no-op ("already
  * cached") and the shared sub-DAG silently recomputes on every
  * reference. And `spark.catalog.clearCache()` is the other wrong tool:
  * it also evicts the warm fixture tables.
  *
  * Sessions that never call [[releaseAll]] (Verify, the tests) see
  * exactly the old `persist()` behavior plus one registry entry per
  * persist; the registry holds at most the frames of one process run.
  */
object Scratch {
  @volatile private var tracked: List[Dataset[_]] = Nil

  implicit class PersistSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration for query-scoped release. */
    def persistScratch(): Dataset[T] = Scratch.register(ds)
  }

  private def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist()
    tracked ::= ds
    ds
  }

  /** Unpersist (blocks + CacheManager entries) every registered frame. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { ds =>
      if (!ds.sparkSession.sparkContext.isStopped)
        ds.unpersist(blocking = false)
    }
    tracked = Nil
  }
}
