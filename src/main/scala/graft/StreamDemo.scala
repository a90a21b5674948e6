package graft

import graft.streaming.{CounterPipeline, CounterStore, Observability}
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
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
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
