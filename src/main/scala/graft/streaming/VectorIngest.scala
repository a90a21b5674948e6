package graft.streaming

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.util.Try

/** Continuous embedding ingestion with semantic dedup-at-admission — the
  * vector twin of [[CorpusIngest]] (text/LSH bands) and [[MediaIngest]]
  * (image dHashes), completing the streaming personality for the ANN
  * surface: each micro-batch of (id, vector) rows is
  *
  *   1. near-deduped WITHIN the batch (SemDeDup's in-cell rule: cosine >=
  *      `threshold` against a smaller-id batch member ⇒ rejected),
  *   2. checked against the PERSISTED store — probing ONLY the batch's
  *      own cells (the IVF partition-pruning design: the store is laid
  *      out `batch=<id>/cluster=<c>`, so admission cost is O(batch ×
  *      cell-share), the corpus is never rescanned),
  *
  * and survivors append as (id, v, norm, cluster) rows under their own
  * `batch=<id>` subdirectory with per-batch overwrite — a replayed
  * micro-batch (foreachBatch is at-least-once) rewrites its own partition
  * instead of duplicating it (the CounterPipeline.mergeBatch posture).
  *
  * The cell quantizer is FROZEN at first ingest (trained by
  * [[Similarity.kmeansFit]] on the first batch and persisted next to the
  * store): production vector stores re-assign new data under the serving
  * quantizer and retrain on a schedule, never per batch — retraining
  * per-batch would silently re-map every stored cell. Like SemDeDup,
  * near-duplicates that fall in DIFFERENT cells are not compared — the
  * recall/cost tradeoff the cell partitioning buys (threshold-grade dups
  * land in the same cell at practical thresholds).
  */
class VectorIngest(spark: SparkSession, storeDir: String,
    centroidsDir: String, vecCol: String = "embedding",
    idCol: String = "vec_id", k: Int = 8, threshold: Double = 0.95d) {

  private def centroids(): Option[DataFrame] =
    // existence-check first: a Try around the reader still logs a noisy
    // FileNotFoundException on every first-batch probe
    if (!new java.io.File(centroidsDir, "_SUCCESS").exists()) None
    else Try(spark.read.parquet(centroidsDir)).toOption

  private def store(): Option[DataFrame] =
    if (!new java.io.File(storeDir).isDirectory) None
    else Try(spark.read.parquet(storeDir)).toOption

  /** Admit one micro-batch; returns the number of admitted vectors. */
  def ingestBatch(batch: DataFrame, batchId: Long): Long = {
    val cents = centroids().getOrElse {
      // first batch: train and freeze the quantizer (parquet's _SUCCESS
      // is the ready marker; a crash mid-train retrains on replay)
      Similarity.kmeansFit(batch, vecCol, idCol, k, iters = 2)
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("centroid_val")))),
          x => x.getField("centroid_val")).as("cvec"))
        .write.mode(SaveMode.Overwrite).parquet(centroidsDir)
      spark.read.parquet(centroidsDir)
    }
    val rows = Similarity.assignToCentroids(batch, vecCol, idCol, cents)
      .select(col(idCol).cast("long").as("id"), col("cluster"))
      .join(batch.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v")), "id")
      .withColumn("norm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 1. within-batch: cosine >= threshold vs a smaller-id batch member
      val inBatchDup = rows.select(col("cluster"), col("id").as("_ida"),
          col("v").as("_va"), col("norm").as("_na"))
        .join(rows.select(col("cluster"), col("id").as("_idb"),
          col("v").as("_vb"), col("norm").as("_nb")), Seq("cluster"))
        .where(col("_ida") < col("_idb"))
        .where(VectorFunctions.dot(col("_va"), col("_vb")) /
          (col("_na") * col("_nb")) >= threshold)
        .select(col("_idb").as("id")).distinct()
      val inBatch = rows.join(inBatchDup, Seq("id"), "left_anti")
      // 2. vs the persisted store, pruned to the batch's own cells.
      // The batch's OWN partition is excluded: a crash during job commit
      // can leave batch=<id> partially visible, and an at-least-once
      // replay that compared against those rows would self-reject them
      // (cosine 1.0) and then OVERWRITE the partition with the remainder
      // — silently dropping the already-persisted vectors. Excluding it
      // makes the per-batch overwrite genuinely idempotent.
      val cells = inBatch.select("cluster").distinct()
        .collect().map(_.getLong(0))
      val admitted = store() match {
        case Some(st) if cells.nonEmpty =>
          val dup = st.where(col("batch") =!= batchId)
            .where(col("cluster").isin(cells.toIndexedSeq: _*))
            .select(col("cluster"), col("v").as("_vs"), col("norm").as("_ns"))
            .join(inBatch, Seq("cluster"))
            .where(VectorFunctions.dot(col("v"), col("_vs")) /
              (col("norm") * col("_ns")) >= threshold)
            .select("id").distinct()
          inBatch.join(dup, Seq("id"), "left_anti")
        case _ => inBatch
      }
      // persisted: count() and the write would otherwise each run the
      // full dedup-join + store-probe chain (the hot per-batch path)
      val admittedCached = admitted
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = admittedCached.count()
        if (n > 0) {
          admittedCached.select("id", "v", "norm", "cluster")
            .write.mode(SaveMode.Overwrite).partitionBy("cluster")
            .parquet(s"$storeDir/batch=$batchId")
        }
        n
      } finally { admittedCached.unpersist(); () }
    } finally { rows.unpersist(); () }
  }

  /** Wire a streaming (id, vector) source through the ingest. */
  def start(vectors: DataFrame, checkpoint: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch((b: DataFrame, id: Long) => { ingestBatch(b, id); () })
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The admitted store so far (None until a batch landed). */
  def admitted(): Option[DataFrame] = store()
}
