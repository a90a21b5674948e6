package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `recentchange` event schema and permissive parser.
  *
  * Mirrors the reference's declared schema (`schema.json:12-195`) and Go
  * struct (`pkg/aggregator/types.go:20-63`), with its permissive semantics
  * (`aggregator/aggregator.go:36-40`): parse failures don't kill the
  * pipeline — the row survives with nulls plus the raw payload in
  * `_corrupt_record`, and still counts toward `total` downstream (missing
  * string == empty string, Go omitempty).
  */
object Recentchange {

  /** Fields the engine consumes (★ in FIXTURES.md §1) plus enough of the
    * rest for schema fidelity; `log_params` stays a raw string (the schema
    * declares a union type, schema.json:180-188 — parse on demand).
    */
  val schema: StructType = StructType(Seq(
    StructField("$schema", StringType),
    StructField("meta", StructType(Seq(
      StructField("uri", StringType),
      StructField("request_id", StringType),
      StructField("id", StringType),
      StructField("dt", StringType),
      StructField("domain", StringType),
      StructField("stream", StringType)))),
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("namespace", IntegerType),
    StructField("comment", StringType),
    StructField("timestamp", LongType),
    StructField("user", StringType),
    StructField("bot", BooleanType),
    StructField("server_url", StringType),
    StructField("server_name", StringType),
    StructField("wiki", StringType),
    StructField("minor", BooleanType),
    StructField("patrolled", BooleanType),
    StructField("length", StructType(Seq(
      StructField("old", LongType), StructField("new", LongType)))),
    StructField("revision", StructType(Seq(
      StructField("old", LongType), StructField("new", LongType)))),
    StructField("log_id", LongType),
    StructField("log_type", StringType),
    StructField("log_action", StringType),
    StructField("log_params", StringType),
    StructField("_corrupt_record", StringType)))

  /** Event-time from the embedded epoch-ms in the SSE event ID — the
    * reference's `"timestamp":(\d+)` regex (`aggregator/aggregator.go:79-89`).
    */
  def tsFromEventId(key: Column): Column =
    timestamp_millis(
      regexp_extract(key, "\"timestamp\":\\s*([0-9]+)", 1).cast("long"))

  /** Parse raw (key, value) messages into typed events with an `event_time`
    * column: prefers the payload's unix-seconds `timestamp`, falls back to
    * the key-embedded epoch-ms (the reference's only source of event time).
    */
  def parse(messages: DataFrame): DataFrame = {
    val parsed = messages
      .withColumn("e", from_json(col("value").cast("string"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    parsed.select(
      col("key").cast("string").as("key"),
      col("e.*"),
      coalesce(
        timestamp_seconds(col("e.timestamp")),
        tsFromEventId(col("key").cast("string"))).as("event_time"))
  }
}
