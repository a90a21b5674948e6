package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the enrichment shape the
  * reference's batch lookup joins (T17) cannot express when BOTH sides are
  * live: e.g. impressions joined to their conversions within an
  * attribution window.
  *
  * Spark buffers both sides' state; without bounds the state grows forever.
  * Correct bounding needs BOTH: (1) watermarks on both inputs (how late
  * each side may arrive) and (2) an event-time interval in the join
  * condition (how far apart matched rows may be) — Spark derives the state
  * eviction horizon from the two together. This operator packages that
  * contract so callers can't accidentally build the unbounded version.
  */
object StreamJoins {

  /** Inner-join two event streams on `key` where the right event lands
    * within [left.time, left.time + window]. `lateness` is each side's
    * watermark delay. State per key is bounded by watermark + window; the
    * join itself shuffles both sides by key — the same co-partitioned
    * exchange a batch join would use.
    */
  def withinWindow(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      window: String, lateness: String): DataFrame = {
    val l = left.withWatermark(leftTime, lateness)
    val r = right.withWatermark(rightTime, lateness)
    l.join(r, l(key) === r(key) &&
      col(rightTime) >= col(leftTime) &&
      col(rightTime) <= col(leftTime) + expr(s"INTERVAL $window"))
      .drop(r(key))
  }
}
