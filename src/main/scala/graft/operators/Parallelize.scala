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
    * the plan already provides them (the 100 TB case) or when `df` is
    * streaming (no partition introspection mid-plan); otherwise hash-
    * repartitioned on `keys` (deterministic co-location) or round-robin
    * when no keys are given.
    *
    * The partition estimate reads the LOGICAL plan only — the previous
    * `df.rdd.getNumPartitions` forced a full logical→physical→RDD
    * conversion per call just to read a count, building a lineage that was
    * immediately discarded. A frame that already crossed a shuffle boundary
    * (join/aggregate/sort/window/repartition) has `shuffle.partitions`
    * tasks; a scan-rooted frame parallelizes by its file count.
    *
    * CONTRACT WEAKENING (deliberate): the estimate is optimistic, so
    * `ensure` is a best-effort floor, not a guarantee. When AQE coalesces a
    * small shuffle below `shuffle.partitions`, or the scan bin-packs many
    * tiny files into fewer splits (`files.maxPartitionBytes`), the needed
    * repartition is silently skipped — results are unchanged and only
    * tail-task parallelism is lost, and only on inputs small enough that
    * AQE/bin-packing fired, i.e. inputs whose absolute cost is already
    * near the job floor. Reading the true physical partition count back
    * would reintroduce the per-call plan materialization this estimate
    * exists to avoid; the trade is measured (round 7) and accepted.
    */
  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    import org.apache.spark.sql.catalyst.plans.logical._
    val crossedShuffle = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Sort | _: Window => true
      case _: RepartitionOperation => true
      case _ => false
    }
    val estimate =
      if (crossedShuffle) spark.sessionState.conf.numShufflePartitions
      else df.inputFiles.length // 0 for a LocalRelation -> repartition
    if (estimate >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
