package graft

import graft.operators.CacheRegistry
import org.apache.spark.storage.StorageLevel

/** The operator helper-cache ledger: persists are tracked, releaseAll drops
  * the blocks for the session (the handle pattern the long-lived
  * personalities rely on — Spark's CacheManager would otherwise pin every
  * helper cache until session end), and released frames keep working.
  */
class CacheRegistrySpec extends SparkSpec {

  test("tracked caches release on demand and stay usable afterwards") {
    CacheRegistry.releaseAll(spark) // isolate from other suites
    val df = CacheRegistry.persisted(
      spark.range(1000).selectExpr("id", "id % 7 AS k"))
    assert(df.count() == 1000L)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(CacheRegistry.trackedCount >= 1)

    val released = CacheRegistry.releaseAll(spark)
    assert(released >= 1)
    assert(df.storageLevel == StorageLevel.NONE)
    // released frames recompute from lineage — still correct
    assert(df.count() == 1000L)
    // idempotent: nothing left to release
    assert(CacheRegistry.releaseAll(spark) == 0)
  }

  test("mark/releaseSince releases only the caches created inside the scope") {
    CacheRegistry.releaseAll(spark)
    val outer = CacheRegistry.persisted(spark.range(10).toDF("id"))
    assert(outer.count() == 10L)
    val m = CacheRegistry.mark()
    val inner = CacheRegistry.persisted(spark.range(20).toDF("id"))
    assert(inner.count() == 20L)
    assert(CacheRegistry.releaseSince(m, spark) == 1)
    assert(inner.storageLevel == StorageLevel.NONE)
    // the pre-mark cache is untouched and still tracked
    assert(outer.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(CacheRegistry.releaseAll(spark) == 1)
  }

  test("operator caches flow through the registry (globalRank)") {
    CacheRegistry.releaseAll(spark)
    val ranked = graft.operators.Sampling.globalRank(
      spark.range(100).selectExpr("id", "id % 3 AS g"),
      Seq(org.apache.spark.sql.functions.col("id").desc))
    assert(ranked.count() == 100L)
    // the range-partitioned prefix-sum frame was persisted AND tracked
    assert(CacheRegistry.releaseAll(spark) >= 1)
  }
}
