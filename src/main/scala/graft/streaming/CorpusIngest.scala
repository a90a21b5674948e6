package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.util.Try

/** Continuous corpus ingestion with incremental near-dedup — the streaming
  * form of the xq42 batch-vs-corpus check: each micro-batch of crawled
  * documents is
  *
  *   1. exact-deduped within the batch (min-id survivor per text),
  *   2. near-deduped within the batch (greedy LSH candidate removal),
  *   3. checked against the PERSISTED band index of everything admitted so
  *      far (`Dedup.bandTable` — O(batch) work, the corpus is never
  *      rescanned),
  *
  * and the survivors append both their documents and their bands. Both
  * stores are written under `batch=<id>` subdirectories with per-batch
  * overwrite, so a replayed micro-batch (foreachBatch is at-least-once)
  * rewrites its own partition instead of duplicating it — the same
  * idempotent-merge posture as CounterPipeline.mergeBatch.
  *
  * At 100 TB the band index is the only state this keeps, it is append-only,
  * and it is keyed by (band_id, band_key) hashes — uniformly partitionable,
  * no compaction needed for correctness.
  */
class CorpusIngest(spark: SparkSession, corpusDir: String, indexDir: String,
    textCol: String = "text", idCol: String = "doc_id") {

  private def existingBands(): Option[DataFrame] =
    Try(spark.read.parquet(indexDir)).toOption

  /** Admit one micro-batch; returns the number of admitted documents. */
  def ingestBatch(batch: DataFrame, batchId: Long): Long = {
    // 1. exact within-batch: min-id survivor per text
    val exactSurvivors = batch.join(
      Dedup.exact(batch, textCol, idCol).select(idCol), Seq(idCol))
    // 2. near within-batch: greedy LSH removal
    val inBatch = Dedup.dropNearDuplicates(exactSurvivors, textCol, idCol)
    // 3. against the persisted index
    val admitted = existingBands() match {
      case None => inBatch
      case Some(bands) =>
        val flagged = Dedup.bandTable(inBatch, textCol, idCol)
          .join(bands.select(col("band_id"), col("band_key")),
            Seq("band_id", "band_key"))
          .select(col(idCol)).distinct()
        inBatch.join(flagged, Seq(idCol), "left_anti")
    }
    val admittedCached = admitted
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = admittedCached.count()
    if (n > 0) {
      admittedCached.write.mode(SaveMode.Overwrite)
        .parquet(s"$corpusDir/batch=$batchId")
      Dedup.bandTable(admittedCached, textCol, idCol)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/batch=$batchId")
    }
    admittedCached.unpersist()
    n
  }

  /** Wire a streaming document source through the ingest. */
  def start(docs: DataFrame, checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch((b: DataFrame, id: Long) => { ingestBatch(b, id); () })
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The admitted corpus so far (empty-schema-safe only once a batch landed). */
  def corpus(): Option[DataFrame] = Try(spark.read.parquet(corpusDir)).toOption
}
