package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped ledger of operator helper caches.
  *
  * Many operators persist an intermediate frame that feeds 2+ consumers
  * (band tables, prefix-sum partitions, edge lists, count tables) and
  * return a LAZY result that still references it — so the operator itself
  * can never unpersist. Spark's CacheManager holds the cached plan by
  * strong reference, so dropping the DataFrame does not release the blocks
  * either: in a long-lived session every such call permanently accumulates
  * MEMORY_AND_DISK blocks.
  *
  * The fix is the handle pattern: operators route persists through
  * [[persisted]], and the session owner calls [[releaseAll]] once the
  * results are materialized (Verify/Bench do this between queries; a
  * serving layer would do it per request cycle). Released frames keep
  * working — they just recompute from lineage.
  */
object CacheRegistry {

  /** Chain-position syntax: `df.groupBy(...).agg(...).trackedCache`. */
  implicit class Cacheable(private val df: DataFrame) extends AnyVal {
    def trackedCache: DataFrame = persisted(df)
  }

  // Strong references on purpose: CacheManager pins the cached plan until
  // an explicit unpersist, so a weak ref would let the handle vanish while
  // the blocks stay — exactly the leak this registry exists to close.
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist at MEMORY_AND_DISK and remember the handle for [[releaseAll]]. */
  def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** Number of caches currently tracked (all sessions). */
  def trackedCount: Int = tracked.size()

  /** Opaque snapshot of the currently-tracked handles, for [[releaseSince]].
    * Identity-based: two persists of equal plans are distinct handles.
    */
  def mark(): java.util.Set[DataFrame] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    val it = tracked.iterator()
    while (it.hasNext) s.add(it.next())
    s
  }

  /** Unpersist every cache tracked AFTER `since` (scoped to `spark` unless
    * null). This is the per-batch counterpart of [[releaseAll]]: a
    * long-lived streaming job (e.g. [[graft.streaming.MediaIngest]]) calls
    * an operator that routes persists through the registry, materializes
    * the batch's outputs, then releases only the caches that batch created
    * — without touching caches an enclosing harness still owns.
    */
  def releaseSince(since: java.util.Set[DataFrame],
      spark: SparkSession = null): Int = {
    var n = 0
    val it = tracked.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (!since.contains(df) &&
          (spark == null || (df.sparkSession eq spark))) {
        df.unpersist(blocking = false)
        it.remove()
        n += 1
      }
    }
    n
  }

  /** Unpersist every tracked cache belonging to `spark` (or all sessions
    * when null). Idempotent — a frame the operator already unpersisted is
    * a no-op. Returns the number of handles released.
    */
  def releaseAll(spark: SparkSession = null): Int = {
    var n = 0
    val it = tracked.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (spark == null || (df.sparkSession eq spark)) {
        df.unpersist(blocking = false)
        it.remove()
        n += 1
      }
    }
    n
  }
}
