package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Compute-parallelism floor for digest-bound map stages.
  *
  * Operators like minhash/simhash/multimodal-decode do orders of magnitude
  * more CPU per input byte than a scan: their natural parallelism is the
  * scan's split count. At production scale a table has thousands of splits
  * and this helper is a NO-OP (the conditional sees enough partitions and
  * returns the frame untouched — no exchange is added to any at-scale
  * plan). The driver's single-row-group bench files, however, cap the scan
  * at ONE task, serializing the md5 work on a 32-core box; for those
  * inputs a keyed repartition costs shuffling the (small) input once and
  * buys back every core.
  */
object Parallelize {

  /** `df` with at least `defaultParallelism` partitions: unchanged when
    * the scan already provides them (the 100 TB case) or when `df` is
    * streaming (no partition introspection mid-plan); otherwise hash-
    * repartitioned on `keys` (deterministic co-location) or round-robin
    * when no keys are given.
    */
  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
