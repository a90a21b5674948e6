package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify / Bench / tests / prod agree.
  *
  * Scale posture: shuffle partitions sized to the local core count (the
  * driver contract pins local[32]); on a real cluster AQE coalescing +
  * skew-join splitting re-plan at runtime, so these settings transfer.
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is TIMESTAMP(NANOS) parquet — read as long, normalized in
      // Tables.events (Spark has no nanosecond TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Generated-class cache sized for a long-lived session serving a
      // LIBRARY of query shapes: the default (100 entries) thrashes once
      // the session has seen ~30+ distinct plans (this suite has 178;
      // each carries several codegen units), so every re-run pays Janino
      // compilation again on what should be a warm path. The cache keys
      // on generated SOURCE, which does not embed input paths — the same
      // plan shape over a different dataset reuses the compiled class.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // ObjectHashAggregate's sort-based fallback threshold is NOT raised
      // globally: bounded-state aggregates (TopKRows' k rows per group)
      // are safe hash-resident at any group count, but a global raise also
      // kept collect-style UNBOUNDED aggregate state hash-resident and
      // OOM'd the sf5 suite (xq08's shingle lists, measured twice).
      // Queries that need it declare it per-query via QueryDef.confs
      // (applied with reset-to-default between queries).
      // RocksDB-backed streaming state: the event-id dedup state of the
      // corpus-ingest personality grows with rate × watermark (the one
      // unbounded-cardinality state in the system) — the default HDFS
      // provider keeps it all heap-resident, RocksDB spills it to local
      // disk. Counter-pipeline state (~10^3 keys) is unaffected either way.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
