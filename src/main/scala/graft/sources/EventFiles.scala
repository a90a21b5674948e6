package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's file-publisher personality (S5/S7 in SURVEY §2.1):
  * one file per event, 2-line format `<ID>\n<json>`
  * (`filepublisher.go:102-104`), consumed by a directory-scanning aggregator
  * that deletes processed files (`file/aggregator.go:115-149,212-215`).
  */
object EventFiles {

  /** Sink: write each (key, value) message as its own 2-line `.dat` file
    * under `dir` — exact on-disk format compatibility with the reference's
    * file publisher, as a foreachBatch-able batch writer. One file per event
    * is inherently a small-scale/debug format (the reference uses it the
    * same way); the Kafka path is the scale path.
    */
  /** The (key, value) string frame every sink publishes — ONE normalization
    * shared by the Kafka and file sinks, so the file round-trip specs
    * exercise the exact projection the Kafka writer sends.
    */
  def messageFrame(df: DataFrame): DataFrame =
    df.select(col("key").cast("string"), col("value").cast("string"))

  def writeBatch(batch: DataFrame, dir: String, prefix: String = "pleiades"): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // Executed on the executors (foreachPartition): files are written in
    // parallel, one per event, with partition-scoped unique names.
    messageFrame(batch)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0
        it.foreach { r =>
          val name = f"$prefix-event-$pid%04d-$i%06d-${System.nanoTime()}%d.dat"
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, name), r.getString(0) + "\n" + r.getString(1))
          i += 1
        }
      }
  }

  /** Streaming sink wiring: each micro-batch lands as .dat files. */
  def sink(messages: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    messages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, _: Long) => writeBatch(b, dir))
      .start()

  /** Batch source: read a directory of 2-line .dat files back into
    * (key, value) messages (the streaming twin is
    * CounterPipeline.fromFileDrop).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*.dat")
      .select(
        split(col("value"), "\n", 2).getItem(0).as("key"),
        split(col("value"), "\n", 2).getItem(1).as("value"))

  /** Kafka sink (S3): publish (key, value) to a topic — the reference's
    * publisher with acks upgraded (its acks=0 async writer is at-most-once,
    * `kafkapublisher.go:55-56`; Spark's sink + checkpoint is at-least-once,
    * and the downstream merge is idempotent). Requires spark-sql-kafka on
    * the classpath; this sandbox ships no Kafka jars at all (connector or
    * broker), so the lines below are config-only plumbing — the projection
    * they publish is `messageFrame`, which IS spec-verified through the
    * file sink round trip.
    */
  def toKafka(messages: DataFrame, bootstrap: String, topic: String,
      checkpointDir: String): StreamingQuery =
    messageFrame(messages)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()
}
