package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training pipelines — no RNG state, stable
  * under repartition and re-runs, portable across engines (md5 ordering).
  * The md5-bucket fraction-sampling / split predicates live in the query
  * layer (xq18/xq19); this adds per-stratum fixed-size samples.
  */
object Sampling {

  /** k rows per stratum, chosen by md5 order of the id (a deterministic
    * "random" permutation), tie-broken by id. One shuffle on the stratum
    * key; at 100 TB, strata are the natural partition column.
    */
  def stratifiedDeterministic(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Sequence packing: assign docs to fixed-capacity training bins by
    * prefix-sum of their token counts in id order —
    * bin = floor(cumulative_start / capacity). Deterministic, one global
    * window; at 100 TB the same computation runs per partition-range with
    * offsets (ordered prefix sums parallelize by range partitioning, which
    * is exactly what Spark's global window does).
    */
  def packSequences(df: DataFrame, idCol: String, sizeCol: String,
      capacity: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_end", sum(col(sizeCol)).over(w))
      .select(col(idCol), col(sizeCol),
        floor((col("cum_end") - col(sizeCol)).cast("double") / capacity)
          .cast("long").as("bin"))
  }
}
