package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-file sizing — the small-files problem is the silent killer of
  * 100 TB tables: a curation run that writes whatever partition count the
  * last shuffle had produces either thousands of KB-files (metadata pressure,
  * seek-bound scans) or a few 100 GB monsters (no scan parallelism).
  *
  * `planFiles` assigns every row a target file id so each file lands near
  * `targetBytes`: file = floor(exclusive-prefix-bytes / targetBytes) in id
  * order — the same distributed two-pass prefix sum as
  * [[Sampling.packSequences]] (range partition → per-partition totals →
  * broadcast offsets; no single-task global window). Deterministic in the
  * id order, so the plan is oracle-checkable (xq56) and stable across
  * re-runs.
  */
object Compaction {

  /** (idCol, bytesCol, file_id) for every row. */
  def planFiles(df: DataFrame, idCol: String, bytesCol: String,
      targetBytes: Long): DataFrame =
    Sampling.packSequences(df, idCol, bytesCol, targetBytes)
      .withColumnRenamed("bin", "file_id")

  /** Materialize the plan: rows co-located by file id and written under
    * `path/file_id=N/`, one data file per planned id (each plan group lands
    * wholly inside one task's partition, so each directory gets exactly one
    * file of ~targetBytes).
    */
  def writeCompacted(df: DataFrame, idCol: String, bytesCol: String,
      targetBytes: Long, path: String): Unit =
    df.join(planFiles(df, idCol, bytesCol, targetBytes)
        .select(col(idCol), col("file_id")), idCol)
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").parquet(path)
}
