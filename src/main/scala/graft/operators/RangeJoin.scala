package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval/range joins without a product plan — with [[AsOfJoin]], the
  * second canonical operator Spark's optimizer lacks. A join whose condition
  * is pure inequality (`l.start <= r.end AND r.start <= l.end`) plans as
  * BroadcastNestedLoopJoin (small side) or CartesianProduct (two big sides):
  * O(N*M) comparisons either way, which is exactly the shape that dies at
  * 100 TB.
  *
  * The fix is the standard bin-and-prune scheme (the idea behind
  * Databricks' range-join optimization and spatial grid joins): quantize the
  * join domain into fixed-width bins, emit each interval once per bin it
  * touches, equi-join on the bin id — a plain hash/sort-merge shuffle join —
  * and re-check the exact predicate inside the bucket. A pair overlapping k
  * shared bins would surface k times, so it is emitted ONLY in its canonical
  * bin: the bin of `max(lStart, rStart)`, which every overlapping pair
  * shares by construction. Exactly-once without a `distinct` (a distinct
  * would be a second shuffle over the whole output).
  *
  * Cost model: explode factor per row = interval_length/binWidth + 1; join
  * work = Σ over bins of |L_bin| × |R_bin|. Pick binWidth near the typical
  * interval length. A hot bin is now an ordinary equi-join skew problem —
  * AQE's skew-join split applies, which it never does for a product join.
  *
  * The reference has no interval join; this generalizes its event-time day
  * bucketing (aggregator day keys) to arbitrary-width overlap queries.
  */
object RangeJoin {

  private def bin(c: Column, w: Long): Column = floor(c / w).cast("long")

  /** Rows sampled per side when deriving the automatic bin width. */
  private val AutoWidthSampleRows = 100000

  /** Derive a bin width from the data: the approximate MEDIAN interval
    * length over a bounded sample of both sides, clamped to >= 1. The cost
    * model's optimum sits near the typical interval length — too narrow
    * multiplies every row by length/width+1 copies, too wide packs
    * unrelated intervals into hot bins — so a naive caller gets a sane
    * explode factor (~2 copies per median-length interval) instead of a
    * degenerate one. One tiny aggregate job (LIMIT-bounded scan + a
    * percentile sketch); a caller who knows the workload passes an explicit
    * width and skips it.
    */
  def autoBinWidth(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String): Long = {
    def lens(df: DataFrame, s: String, e: String) =
      df.select((col(e).cast("double") - col(s).cast("double")).as("_len"))
        .where(col("_len").isNotNull).limit(AutoWidthSampleRows)
    val row = lens(left, lStart, lEnd).unionAll(lens(right, rStart, rEnd))
      .agg(percentile_approx(col("_len"), lit(0.5), lit(10000)))
      .first()
    // Both sides empty (or all bounds null): percentile_approx returns
    // null. Any positive width is correct (width only moves cost, and
    // there is no cost on empty input) — fall back to 1 instead of
    // throwing an opaque NPE where an explicit binWidth would have
    // returned an empty result.
    if (row.isNullAt(0)) 1L else math.max(1L, math.round(row.getDouble(0)))
  }

  /** All (left, right) pairs whose closed intervals [lStart,lEnd] and
    * [rStart,rEnd] overlap. Bounds must be numeric (cast dates to epoch
    * days / timestamps to epoch seconds upstream) with start <= end; the two
    * sides' column names must be disjoint. Each qualifying pair is emitted
    * exactly once; the plan is a shuffle equi-join on the bin id (no
    * CartesianProduct / NestedLoop — asserted by RangeJoinSpec).
    *
    * `binWidth = 0` (the default) derives the width from the sampled median
    * interval length ([[autoBinWidth]]); results are identical for ANY
    * positive width — the width only moves cost.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long = 0L): DataFrame = {
    require(binWidth >= 0, s"binWidth must be positive or 0=auto, got $binWidth")
    val w =
      if (binWidth > 0) binWidth
      else autoBinWidth(left, lStart, lEnd, right, rStart, rEnd)
    val lb = left.withColumn("_lbin",
      explode(sequence(bin(col(lStart), w), bin(col(lEnd), w))))
    val rb = right.withColumn("_rbin",
      explode(sequence(bin(col(rStart), w), bin(col(rEnd), w))))
    lb.join(rb,
        lb("_lbin") === rb("_rbin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          lb("_lbin") === bin(greatest(col(lStart), col(rStart)), w))
      .drop("_lbin", "_rbin")
  }

  /** Per-key disjoint interval union: collapse each key's closed intervals
    * [startCol, endCol] into the minimal set of disjoint intervals covering
    * the same points, one output row per merged interval (same column
    * names). The classic sweep — sort by start, a new merged group starts
    * where an interval's start exceeds the running max end of everything
    * before it — stated as two window functions over the SAME
    * (key, start-ordered) spec plus a (key, group) min/max aggregate.
    * ONE exchange total: both windows share one sort, and the window's
    * hash-by-key partitioning already clusters (key, group), so the
    * aggregate adds no shuffle. No per-key state is ever collected into a
    * single row, so per-key interval counts are unbounded — a key with a
    * billion intervals is just a big sorted partition (AQE skew handling
    * applies), never a row-width blob.
    *
    * Group identity is tie-order-invariant: intervals sharing a start
    * always land in one group (any of them raises the running max to at
    * least that start), so equal-start sort nondeterminism cannot move a
    * group boundary.
    *
    * Null-bounded intervals contain no points under SQL comparison
    * semantics, so they are dropped up front — which also keeps nulls out
    * of the `start > max(end)` boundary test, where they would silently
    * merge instead of failing.
    *
    * Disjointness is what downstream counting relies on: a point lies in at
    * most ONE merged interval per key, so `pointInIntervalJoin` against the
    * output counts each (point, key) containment exactly once — a distinct
    * that never materializes (the rq29 union path).
    */
  def mergeIntervals(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("_ms"))
    val prevMaxEnd = max(col("_me"))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df.where(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(keyCol), col(startCol).cast("long").as("_ms"),
        col(endCol).cast("long").as("_me"))
      .withColumn("_new",
        when(prevMaxEnd.isNull || col("_ms") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("_grp",
        sum(col("_new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_grp"))
      .agg(min(col("_ms")).as(startCol), max(col("_me")).as(endCol))
      .select(col(keyCol), col(startCol), col(endCol))
  }

  /** Point-in-interval join: each row of `points` matched to every row of
    * `intervals` whose [iStart,iEnd] contains the point. A point touches
    * exactly one bin, so no canonical-bin dedup is needed. `binWidth = 0`
    * (the default) derives the width from the intervals' sampled median
    * length (a point is a zero-length interval and would only drag the
    * median toward a degenerate 1, so only the interval side votes).
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      pCol: String, iStart: String, iEnd: String, binWidth: Long = 0L): DataFrame = {
    require(binWidth >= 0, s"binWidth must be positive or 0=auto, got $binWidth")
    val w =
      if (binWidth > 0) binWidth
      else autoBinWidth(intervals, iStart, iEnd, intervals, iStart, iEnd)
    val pb = points.withColumn("_pbin", bin(col(pCol), w))
    val ib = intervals.withColumn("_ibin",
      explode(sequence(bin(col(iStart), w), bin(col(iEnd), w))))
    pb.join(ib,
        pb("_pbin") === ib("_ibin") &&
          col(pCol) >= col(iStart) && col(pCol) <= col(iEnd))
      .drop("_pbin", "_ibin")
  }
}
