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
      // ObjectHashAggregate (TypedImperativeAggregate path, e.g. TopKRows)
      // silently degrades to SORT-based aggregation past this many groups
      // per task — default 128, i.e. any realistic vocabulary re-sorts the
      // full stream and re-inherits the key skew the aggregate form
      // removed (measured: xq44's top-k pass 6.6 s -> see BASELINE).
      // Bounded-state aggregates (k rows per group) are safe hash-resident
      // at any realistic group count.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
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
