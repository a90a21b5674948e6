package graft

import graft.sources.EventFiles
import graft.streaming.{CounterPipeline, CounterStore, Observability, QueryApi}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end demo of the streaming personality using the
  * file-drop source (the reference's one-file-per-event publisher format,
  * S5/S7): `StreamDemo <eventsDir> <tableDir> <checkpointDir> [sseUri]`
  * ingests every `*.dat` file (2 lines: ID, JSON payload), aggregates into
  * the counter store, and prints the per-day counters.
  *
  * With the optional 4th arg, the live path runs end-to-end: the SSE
  * long-poll bridge (S1, `SseBridge`) connects to `sseUri` (a live
  * `text/event-stream` endpoint or a replay server) and drops events into
  * `eventsDir` for ~10 s before the engine drains them.
  *
  * SOAK MODE — `StreamDemo --soak <seconds> <eventsDir> <tableDir>
  * <checkpointDir> [sseUri]` — runs the whole stack CONCURRENTLY the way
  * production would: SSE bridge (when a uri is given) continuously dropping
  * events, the streaming pipeline micro-batching them into the counter
  * store, and the REST/metrics API serving live queries, for the requested
  * wall-clock duration. On shutdown it drains the backlog and audits the
  * store against the BATCH TWIN (the same events re-aggregated as one
  * batch): any mismatch means the streaming path lost/duplicated an update.
  * Against live WMF (network required):
  * `runMain graft.StreamDemo --soak 300 /tmp/ev /tmp/agg /tmp/ckpt
  *   https://stream.wikimedia.org/v2/stream/recentchange`
  */
object StreamDemo {

  final case class SoakReport(
      eventsDropped: Long,
      batches: Long,
      storeRows: Long,
      twinMatches: Boolean,
      apiProbes: Long)

  /** Run bridge + pipeline + API concurrently for `seconds`, drain, audit
    * vs the batch twin. Returns the audit report (spec-consumable).
    */
  def soak(spark: SparkSession, eventsDir: String, tableDir: String,
      ckptDir: String, seconds: Long, sseUri: Option[String],
      apiPort: Int = 0): SoakReport = {
    val recorder = Observability.attach(spark)
    val bridge = sseUri.map(graft.sources.SseBridge.start(_, eventsDir))
    val messages = CounterPipeline.fromFileDrop(spark, eventsDir,
      maxFilesPerTrigger = 10000)
    val q = CounterPipeline.start(spark, messages, tableDir, ckptDir,
      trigger = Trigger.ProcessingTime("2 seconds"))
    val store = new CounterStore(spark, tableDir)
    val api = new QueryApi(store, Some(recorder))
    val port = api.start(apiPort)
    var apiProbes = 0L
    val deadline = System.currentTimeMillis() + seconds * 1000
    try {
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        // live query against the serving layer while the stream runs —
        // the point of the soak is everything running AT THE SAME TIME
        val url = java.net.URI.create(s"http://127.0.0.1:$port/api/days").toURL
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        try { conn.getResponseCode; apiProbes += 1 } finally conn.disconnect()
      }
    } finally {
      bridge.foreach(_.stop())
      q.processAllAvailable() // drain whatever the bridge dropped last
      q.stop()
      api.stop()
    }
    // Batch-twin audit: every event the stream saw, re-aggregated in one
    // batch pass, must equal the incrementally merged store exactly.
    val twin = CounterPipeline.dailyCounterAgg(
      EventFiles.read(spark, eventsDir), dedupeEvents = true)
      .select("day", "counter", "n", "growth")
    val diff = twin.exceptAll(store.table.select("day", "counter", "n", "growth"))
      .unionAll(store.table.select("day", "counter", "n", "growth").exceptAll(twin))
    SoakReport(
      eventsDropped = bridge.map(_.eventsWritten.get().toLong)
        .getOrElse(EventFiles.read(spark, eventsDir).count()),
      batches = recorder.toDF(spark).count(),
      storeRows = store.table.count(),
      twinMatches = diff.isEmpty,
      apiProbes = apiProbes)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--soak")) {
      val Array(_, secs, eventsDir, tableDir, ckptDir) = args.take(5)
      val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
        "graft-soak")
      val report = soak(spark, eventsDir, tableDir, ckptDir, secs.toLong,
        args.lift(5))
      println(s"=== soak report ===\n$report")
      spark.stop()
      if (!report.twinMatches) sys.exit(1)
      return
    }
    val Array(eventsDir, tableDir, ckptDir) = args.take(3)
    args.lift(3).foreach { uri =>
      val bridge = graft.sources.SseBridge.start(uri, eventsDir)
      Thread.sleep(10000)
      bridge.stop()
      println(s"=== SSE bridge: ${bridge.eventsWritten.get()} events from $uri ===")
    }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-stream-demo")
    val recorder = Observability.attach(spark)
    val messages = CounterPipeline.fromFileDrop(spark, eventsDir)
    val q = CounterPipeline.start(spark, messages, tableDir, ckptDir,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val store = new CounterStore(spark, tableDir)
    println("=== batch progress (T8 observability) ===")
    recorder.toDF(spark).show(20, truncate = false)
    println("=== days ===")
    store.availableDays(minDay = 0L).show(50, truncate = false)
    println("=== counters by day ===")
    store.table.orderBy("day", "counter").show(200, truncate = false)
    spark.stop()
  }
}
