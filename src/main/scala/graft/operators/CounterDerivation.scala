package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core semantics: conditionally fan one event out into N
  * counter keys, bucketed by event-time day.
  *
  * Reference: `pkg/aggregator/aggregator.go:32-66` (CountersFromEventData)
  * derives, per event: always `total`; `wiki_<wiki>` when wiki != "";
  * `type_<type>` when type != ""; `bot` when bot; `minor` when minor; and
  * `length_inc`/`length_dec` depending on old<new when the length struct is
  * present, plus `lendiff = new - old`. `pkg/aggregator/kafka/aggregator.go:
  * 174-189` then increments a per-day and an all-time Redis counter for each
  * derived key (day = epoch_ms / 86400000).
  *
  * Spark-first shape: a single `select` with `when(...)` branches feeding
  * `array_compact` + `explode` — filter/project/case-when/fan-out fuse into
  * one whole-stage-codegen pass; the grouped count after it is a standard
  * partial+final hash aggregate, so at 100 TB the only shuffle is on
  * (day, counter), whose cardinality is tiny (days x distinct counters).
  */
object CounterDerivation {

  /** Epoch day from a timestamp column (reference: ts_ms / 86400000). */
  def epochDay(ts: Column): Column = floor(unix_timestamp(ts) / 86400L).cast("long")

  /** Fan-out with `event_time` retained — the streaming-side primitive (the
    * windowed aggregation groups on event_time, not a precomputed day).
    * Missing string == empty string, matching Go `omitempty` semantics
    * (`aggregator/aggregator.go:41,46`).
    */
  def explodeRecentchange(df: DataFrame): DataFrame = {
    val wiki = coalesce(col("wiki"), lit(""))
    val typ  = coalesce(col("type"), lit(""))
    val hasLen = col("length").isNotNull &&
      col("length.old").isNotNull && col("length.new").isNotNull
    val counters = array_compact(array(
      lit("total"),
      when(wiki =!= "", concat(lit("wiki_"), wiki)),
      when(typ =!= "", concat(lit("type_"), typ)),
      when(coalesce(col("bot"), lit(false)), lit("bot")),
      when(coalesce(col("minor"), lit(false)), lit("minor")),
      when(hasLen,
        when(col("length.old") < col("length.new"), lit("length_inc"))
          .otherwise(lit("length_dec")))))
    df.select(
      col("event_time"),
      explode(counters).as("counter"),
      coalesce(col("length.new") - col("length.old"), lit(0L)).as("lendiff"))
  }

  /** Batch view: fan-out keyed by epoch day (the reference's Redis key shape
    * `day_<d>_<counter>`).
    */
  def forRecentchange(df: DataFrame): DataFrame =
    explodeRecentchange(df).select(
      epochDay(col("event_time")).as("day"), col("counter"), col("lendiff"))

  /** Same fan-out shape over the synthetic `events` table
    * (event_id, ts, user_id, event_type, value, props) so the semantics are
    * oracle-checkable: `total` always; `type_<event_type>` when non-empty
    * (the `wiki_<w>` analogue); `bot` when user_id % 7 = 0; `minor` when
    * value < 10; `value_inc`/`value_dec` when value >= 50 / < 50 (the
    * length_inc/length_dec analogue).
    */
  def forEvents(df: DataFrame): DataFrame = {
    val typ = coalesce(col("event_type"), lit(""))
    val counters = array_compact(array(
      lit("total"),
      when(typ =!= "", concat(lit("type_"), typ)),
      when(col("user_id") % 7 === 0, lit("bot")),
      when(col("value") < 10d, lit("minor")),
      when(col("value").isNotNull,
        when(col("value") >= 50d, lit("value_inc")).otherwise(lit("value_dec")))))
    df.select(
      epochDay(col("ts")).as("day"),
      explode(counters).as("counter"))
  }

  /** Per-day grouped counts over the fan-out — the streaming aggregation's
    * batch twin (reference: the Redis INCR loop).
    */
  def dailyCounters(df: DataFrame): DataFrame =
    forEvents(df).groupBy(col("day"), col("counter"))
      .agg(count(lit(1)).as("n"))

  /** All-time counters as a roll-up of the per-day aggregate (cheaper than a
    * second unbounded streaming aggregation — SURVEY §7 risk (c)).
    */
  def allTimeCounters(daily: DataFrame): DataFrame =
    daily.groupBy(col("counter")).agg(sum(col("n")).as("n"))
}
