package graft.streaming

import graft.operators.CounterDerivation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** The reference's whole streaming personality as ONE Structured Streaming
  * query (SURVEY §3.2): Kafka/file source → permissive JSON parse →
  * conditional counter fan-out → event-time daily windows → update-mode
  * stateful aggregation → idempotent merge into a day-partitioned parquet
  * aggregate store.
  *
  * What the reference hand-builds, Spark supplies: consumer-group offsets →
  * checkpointing; Redis INCR running state → the streaming state store;
  * restart loops → query restart from checkpoint; at-least-once double
  * counting → exactly-once (replace-by-key merge is idempotent across batch
  * retries).
  *
  * Scale posture: state is keyed by (day, counter) — cardinality is days ×
  * distinct counters (the reference's whole Redis keyspace, ~10^3-10^5), so
  * state stays tiny no matter the event volume; the only wide shuffle is the
  * aggregation exchange on that same small key space. Late data: the
  * reference accepts late events forever (SURVEY §2.3); we default to a
  * generous configurable watermark so state is bounded.
  */
object CounterPipeline {

  /** Production source: Kafka (needs spark-sql-kafka on the classpath —
    * S3/S6 in SURVEY §2.1). Tests use MemoryStream / file sources instead.
    */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key"), col("value"))

  /** File-drop source — the reference's one-file-per-event publisher (S5/S7):
    * 2-line files `ID\n<json>`; `cleanSource` can archive/delete processed
    * files like the reference's post-process delete (`file/aggregator.go:212`).
    */
  /** `maxFilesPerTrigger` is the rate limit (0 = unlimited): the reference
    * applies backpressure through its unbuffered channels
    * (`coordinator.go:38-39`); Spark's equivalent is per-trigger input
    * bounding — a restart after long downtime then drains the backlog in
    * bounded micro-batches instead of one giant catch-up batch (the Kafka
    * twin is `maxOffsetsPerTrigger`).
    */
  def fromFileDrop(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.format("text")
      .option("wholetext", "true")
    val limited =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    limited.load(dir)
      .select(
        split(col("value"), "\n", 2).getItem(0).as("key"),
        split(col("value"), "\n", 2).getItem(1).as("value"))
  }

  /** Parse → event-ID dedup → fan-out → watermark → daily tumbling window →
    * count + growth. Output columns: (day, counter, n, growth) with
    * day = epoch day of the window start.
    *
    * `dedupeEvents` (default on) drops re-deliveries of the same event ID
    * within the watermark via `dropDuplicatesWithinWatermark` — the
    * reference's at-least-once Kafka path can double-count on redelivery
    * (SURVEY §2.3); this closes that hole with bounded state.
    *
    * The dedup identity is the parsed `meta.id` (the per-event UUID,
    * schema.json meta block) with the raw message key as fallback: the SSE
    * key only carries (topic, partition, timestamp-ms) and is NOT unique —
    * two distinct events in the same millisecond share it, so deduping on
    * the key alone would silently drop legitimate events.
    */
  def dailyCounterAgg(messages: DataFrame, watermark: String = "48 hours",
      dedupeEvents: Boolean = true): DataFrame = {
    val parsed = Recentchange.parse(messages)
      .withWatermark("event_time", watermark)
    val keyed = parsed.withColumn("_event_id",
      coalesce(col("meta.id"), col("key")))
    val deduped =
      if (dedupeEvents && parsed.isStreaming)
        keyed.dropDuplicatesWithinWatermark("_event_id").drop("_event_id")
      else if (dedupeEvents) keyed.dropDuplicates("_event_id").drop("_event_id")
      else parsed
    CounterDerivation.explodeRecentchange(deduped)
      .groupBy(window(col("event_time"), "1 day"), col("counter"))
      .agg(count(lit(1)).as("n"), sum(col("lendiff")).as("growth"))
      .select(
        CounterDerivation.epochDay(col("window.start")).as("day"),
        col("counter"), col("n"), col("growth"))
  }

  /** Idempotent replace-by-key merge of an update-mode micro-batch into the
    * parquet aggregate store at `tableDir`, partitioned by day.
    *
    * Update mode emits the NEW TOTAL per touched key, so merge = replace:
    * re-running a failed batch writes identical values (exactly-once effect).
    * Only day partitions whose content GENUINELY changed are rewritten
    * (dynamic partition overwrite): a replayed batch whose totals already
    * match the store — or one whose late rows land on a subset of its days —
    * touches only the differing partitions.
    *
    * Unordered-feed posture: the reference accepts late events unboundedly
    * (`web/handler.go:190`), so a backfill/replay feed makes every batch
    * touch every day. Two things keep that from degenerating (the r6 soak
    * measured 1.1 k ev/s of pure merge pathology without them):
    *   - rewrites are pruned to changed days via an all-column anti-join of
    *     the batch against the store (both sides are counter-cardinality
    *     metadata, never event-scale), and
    *   - the merged rows are CLUSTERED BY day before the write, so each day
    *     partition is exactly one file instead of one file per shuffle task —
    *     without it, N days × 32 tasks of tiny files compound into the next
    *     batch's read.
    *
    * Reader isolation (r17, [[CounterTable]]): the merge writes its
    * changed days into a FRESH generation directory, hard-links the
    * unchanged days over, and swaps the `_current` pointer atomically —
    * a concurrent API read never sees a directory being rewritten (the
    * previous in-place dynamic overwrite 500'd concurrent `/api/days`
    * reads mid-swap, r16 SoakSpec log).
    */
  def mergeBatch(spark: SparkSession, tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val rows = batch.select("day", "counter", "n", "growth")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val days = rows.select("day").distinct().collect().map(_.getLong(0))
      if (days.nonEmpty) {
        val curGen = CounterTable.currentGen(tableDir)
        // the prior data root: the live generation, or the plain directory
        // for a store that predates generations (first merge adopts it)
        val priorDir = curGen match {
          case Some(g) => Some(new java.io.File(tableDir, g))
          case None =>
            val flat = new java.io.File(tableDir)
            if (flat.isDirectory) Some(flat) else None
        }
        val existing = priorDir match {
          case Some(d) =>
            try {
              spark.read.parquet(d.toString)
                .where(col("day").isin(days.toIndexedSeq: _*))
                .select("day", "counter", "n", "growth")
            } catch {
              case _: org.apache.spark.sql.AnalysisException => // first batch
                emptyCounters(spark)
            }
          case None => emptyCounters(spark)
        }
        // a day changed iff the batch carries a (key, total) the store
        // doesn't already hold — all-column anti-join, metadata-scale
        val changedDays = rows
          .join(existing, Seq("day", "counter", "n", "growth"), "left_anti")
          .select("day").distinct().collect().map(_.getLong(0))
        if (changedDays.nonEmpty) {
          val changed = col("day").isin(changedDays.toIndexedSeq: _*)
          val merged = rows.where(changed)
            .unionByName(
              existing.where(changed).join(rows.select("day", "counter"),
                Seq("day", "counter"), "left_anti"))
          val nextIdx = curGen.map(CounterTable.genIndex(_) + 1).getOrElse(0L)
          val newGen = CounterTable.genName(nextIdx)
          val newDir = new java.io.File(tableDir, newGen)
          // a crashed prior attempt left an uncommitted half-build here
          if (newDir.exists()) CounterTable.deleteRecursively(newDir)
          merged
            .repartition(col("day")) // one file per day partition
            .write
            .mode("overwrite")
            .partitionBy("day")
            .parquet(newDir.toString)
          // unchanged days ride over as hard links — O(changed days) work
          val changedSet = changedDays.toSet
          priorDir.foreach { prior =>
            Option(prior.listFiles()).getOrElse(Array.empty[java.io.File])
              .filter(f => f.isDirectory && f.getName.startsWith("day="))
              .filterNot(f => changedSet(f.getName.stripPrefix("day=").toLong))
              .foreach(dayDir => graft.operators.IndexStore.linkData(
                dayDir.toString, new java.io.File(newDir, dayDir.getName).toString))
          }
          CounterTable.commit(tableDir, newGen)
          // keep the predecessor as the in-flight-reader grace window
          CounterTable.prune(tableDir, keepFrom = nextIdx - 1)
        }
      }
    } finally rows.unpersist()
  }

  private def emptyCounters(spark: SparkSession): DataFrame =
    spark.emptyDataFrame
      .select(lit(0L).as("day"), lit("").as("counter"),
        lit(0L).as("n"), lit(0L).as("growth")).limit(0)

  /** Wire the full pipeline: source → aggregate → merge sink. */
  def start(spark: SparkSession, messages: DataFrame, tableDir: String,
      checkpointDir: String, watermark: String = "48 hours",
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    dailyCounterAgg(messages, watermark).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(mergeBatch(spark, tableDir) _)
      .start()
}
