package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the data-skipping story for a
  * 100 TB table queried by more than one column.
  *
  * Sorting a table by one column gives perfect file-level min/max pruning on
  * that column and none on any other. Interleaving the bits of two (or more)
  * columns into a single z-value and range-partitioning + sorting by it
  * keeps rows that are close in EITHER dimension in the same files, so every
  * file's per-column min/max footprint (exactly what parquet row-group stats
  * and table-format file stats expose to scan pruning) stays a small box
  * instead of a full-width stripe. This is the same layout trick behind
  * Delta/Iceberg `ZORDER BY` — here as a plain DataFrame transform: compute
  * z (map-only), `repartitionByRange(z)` (one shuffle), sort within
  * partitions (no extra exchange), write.
  *
  * All arithmetic is integer shifts/masks and one min/max normalization pass
  * (comparisons only) — deterministic across engines and partitionings, so
  * the layout is oracle-checkable (xq54).
  */
object ZOrder {

  /** Bit-interleave two non-negative `bits`-bit longs: x's bit i lands at
    * position 2i, y's at 2i+1. The per-bit terms occupy disjoint positions,
    * so integer addition is bitwise-or — and identical in any engine with
    * 64-bit shifts.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Affine-map a column onto the full [0, 2^bits) grid given its corpus
    * [mn,mx] — z-ordering raw low-cardinality values would leave the high
    * interleaved bits constant. floor(t + 0.5) keeps the map portable
    * (pure IEEE; no engine-specific rounding).
    */
  def normalize(c: Column, mn: Column, mx: Column, bits: Int = 16): Column =
    floor((c.cast("double") - mn.cast("double")) * lit(((1L << bits) - 1).toDouble) /
        greatest(mx.cast("double") - mn.cast("double"), lit(1.0)) + lit(0.5))
      .cast("long")

  /** Z-value per row for two numeric columns, normalized to the grid from a
    * single corpus min/max pass (broadcast single-row stats — no wide
    * shuffle before the final range partition).
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(xCol).cast("long")).as("_xmn"), max(col(xCol).cast("long")).as("_xmx"),
      min(col(yCol).cast("long")).as("_ymn"), max(col(yCol).cast("long")).as("_ymx"))
    df.crossJoin(broadcast(stats))
      .withColumn("z", interleave(
        normalize(col(xCol), col("_xmn"), col("_xmx"), bits),
        normalize(col(yCol), col("_ymn"), col("_ymx"), bits), bits))
      .drop("_xmn", "_xmx", "_ymn", "_ymx")
  }

  /** The layout operator: cluster `df` into `nFiles` write units along the
    * z-curve. Downstream `.write.parquet` emits one file per partition whose
    * per-column min/max stats are compact boxes (ZOrderSpec measures the
    * box-area win vs a single-column sort).
    */
  def layout(df: DataFrame, xCol: String, yCol: String, nFiles: Int,
      bits: Int = 16): DataFrame =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
}
