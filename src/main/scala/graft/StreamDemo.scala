package graft

import graft.streaming.{CounterPipeline, CounterStore, Observability}
import org.apache.spark.sql.streaming.Trigger

/** Runnable end-to-end demo of the streaming personality using the
  * file-drop source (the reference's one-file-per-event publisher format,
  * S5/S7): `StreamDemo <eventsDir> <tableDir> <checkpointDir>` ingests every
  * `*.dat` file (2 lines: ID, JSON payload), aggregates into the counter
  * store, and prints the per-day counters.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(eventsDir, tableDir, ckptDir) = args
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
