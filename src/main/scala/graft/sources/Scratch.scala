package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Engine-managed scratch-cache registry. Operators persist shared
  * sub-DAGs (a bitmap table feeding both sides of a self-join, a
  * signature frame read by candidate-gen and verify, ...) through
  * [[Scratch.PersistSyntax.persistScratch]] instead of a bare
  * `persist()`, and iterative loops register their lineage-truncation
  * frames through [[registerCkpt]]. A long-lived session (the bench, a
  * REPL) releases every query-scoped cache in one call with
  * [[releaseAll]] without touching [[Tables]]' warm table cache.
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
  * Why STRONG references, not WeakReference entries: the operator-local
  * Dataset becomes unreachable the moment its builder returns — BEFORE
  * the query action that materializes it finishes — so any GC during
  * execution would clear a weak entry and [[releaseAll]] would silently
  * miss the release, reintroducing the cross-query block accumulation
  * this registry exists to prevent. Growth in sessions that never call
  * [[releaseAll]] is bounded instead by pruning: every registration
  * first drops entries whose storage was already released elsewhere
  * (`storageLevel == NONE`, e.g. Verify's per-query `clearCache()`) or
  * whose context stopped, so the registry never holds more than one
  * query's live frames plus released-entry stubs awaiting the next
  * registration.
  */
object Scratch {
  @volatile private var tracked: List[Dataset[_]] = Nil
  @volatile private var ckptRdds: List[RDD[_]] = Nil

  implicit class PersistSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    /** `persist()` + registration for query-scoped release. */
    def persistScratch(): Dataset[T] = Scratch.register(ds)
  }

  private def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    prune()
    // `Dataset.storageLevel` resolves through the CacheManager by
    // CANONICAL plan, so it also sees a cache entry created via a
    // different Dataset instance — e.g. two pipeline builders each
    // deriving the same shared frame (q_dedup_recall builds the token
    // bitmap table directly AND through minhashPairs). Persisting such a
    // plan again is a no-op that logs "Asked to cache already cached
    // data" per call; skip it — the instance that did persist owns the
    // entry and its release, and later instances still resolve to the
    // cached representation at plan time.
    if (ds.storageLevel == StorageLevel.NONE) {
      ds.persist()
      tracked ::= ds
    }
    ds
  }

  /** Register the executor-resident RDD behind a `localCheckpoint()` /
    * `checkpoint()` frame so [[releaseAll]] frees its blocks. Checkpoint
    * blocks bypass the CacheManager entirely (the frame's plan is a
    * [[org.apache.spark.sql.execution.LogicalRDD]] over an RDD persisted
    * directly), so `Dataset.unpersist()` cannot release them and a
    * direct `RDD.unpersist()` is both necessary and safe — there is no
    * plan-cache entry to orphan. Without this, every round of an
    * iterative query (connected components, rank loops) leaks one
    * frame's blocks until ContextCleaner GC gets to them. */
  def registerCkpt[T](ds: Dataset[T]): Dataset[T] = synchronized {
    prune()
    ds.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(r => ckptRdds ::= r)
    ds
  }

  /** Drop entries already released elsewhere (or whose context stopped)
    * so sessions that never call [[releaseAll]] don't grow the registry
    * without bound. */
  private def prune(): Unit = {
    tracked = tracked.filter { ds =>
      !ds.sparkSession.sparkContext.isStopped &&
        ds.storageLevel != StorageLevel.NONE
    }
    ckptRdds = ckptRdds.filter { r =>
      !r.sparkContext.isStopped && r.getStorageLevel != StorageLevel.NONE
    }
  }

  /** Unpersist (blocks + CacheManager entries) every registered frame and
    * every registered checkpoint RDD.
    *
    * ASYMMETRY to be aware of: released cache entries degrade gracefully
    * (a later action on the same Dataset recomputes from lineage), but a
    * released localCheckpoint RDD is DESTROYED — its lineage was
    * truncated, so the persisted blocks were the only copy, and a
    * DataFrame still referencing it (e.g. a held connectedComponents
    * result) fails any further action with "Checkpoint block not found".
    * Call this only at a point where the query's results have been fully
    * consumed (the bench does so after each query's count; Verify after
    * each query's parquet dump). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { ds =>
      if (!ds.sparkSession.sparkContext.isStopped)
        ds.unpersist(blocking = false)
    }
    tracked = Nil
    ckptRdds.foreach { r =>
      if (!r.sparkContext.isStopped) r.unpersist(blocking = false)
    }
    ckptRdds = Nil
  }
}
