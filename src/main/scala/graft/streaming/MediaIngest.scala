package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.util.Try

/** Continuous MEDIA ingestion with perceptual near-dedup — the multimodal
  * twin of [[CorpusIngest]]: each micro-batch of image assets
  * (doc_id, payload) is
  *
  *   1. decoded once into dHashes ([[Multimodal.imageHashes]] — the only
  *      codec pass; everything downstream works on 64-bit hashes),
  *   2. near-deduped within the batch (greedy removal over the banded
  *      hamming pairs),
  *   3. probed against the PERSISTED hash index: a batch asset within
  *      hamming ≤ 3 of ANY admitted hash is rejected — this catches
  *      re-encoded, brightness-shifted, or lightly-edited duplicate
  *      images whose exact payload hashes all differ,
  *
  * and survivors append their (id, h0, h1) rows to the index. The index
  * probe is a band equi-join of batch hashes against index hashes —
  * O(batch × collisions), the corpus payloads are never rescanned or
  * re-decoded. Batch partitions are overwritten by id, so at-least-once
  * replay is idempotent (same posture as CorpusIngest / mergeBatch).
  *
  * At 100 TB the index is 16 bytes per admitted asset, append-only, and
  * the probe's key space (band_id, band_key) needs the same hot-value
  * awareness as the batch pair search (perceptual hashes are low-entropy);
  * banding the batch side's DISTINCT hash values keeps probe work bounded.
  */
class MediaIngest(spark: SparkSession, corpusDir: String, indexDir: String,
    maxHamming: Int = 3) {

  private def existingIndex(): Option[DataFrame] =
    Try(spark.read.parquet(indexDir)).toOption

  /** Admit one micro-batch of (doc_id, payload); returns admitted count. */
  def ingestBatch(batch: DataFrame, batchId: Long): Long = {
    val hashes = Multimodal.imageHashes(spark, batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // within-batch: greedy removal — the higher id of each pair drops
    val inBatch = hashes.join(
      Multimodal.imageNearDupPairs(hashes, maxHamming)
        .select(col("id_b").as("id")).distinct(),
      Seq("id"), "left_anti")
    // index probe: batch DISTINCT hash values banded against the index
    val admitted = existingIndex() match {
      case None => inBatch
      case Some(idx) =>
        val probe = Multimodal.hashBands(
          inBatch.select(col("h0"), col("h1")).distinct())
        val indexed = Multimodal.hashBands(
            idx.select(col("h0"), col("h1")).distinct())
          .withColumnRenamed("h0", "i_h0").withColumnRenamed("h1", "i_h1")
        val hotValues = probe.join(indexed, Seq("band_id", "band_key"))
          .where(expr(s"bit_count(h0 ^ i_h0) + bit_count(h1 ^ i_h1) <= $maxHamming"))
          .select(col("h0"), col("h1")).distinct()
        inBatch.join(hotValues, Seq("h0", "h1"), "left_anti")
    }
    val admittedCached = admitted
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = admittedCached.count()
    if (n > 0) {
      batch.join(admittedCached.select(col("id").as("doc_id")), Seq("doc_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$corpusDir/batch=$batchId")
      admittedCached.select("id", "h0", "h1")
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/batch=$batchId")
    }
    admittedCached.unpersist()
    hashes.unpersist()
    n
  }

  /** Wire a streaming asset source through the ingest. */
  def start(assets: DataFrame, checkpoint: String): StreamingQuery =
    assets.writeStream
      .foreachBatch((b: DataFrame, id: Long) => { ingestBatch(b, id); () })
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Admitted assets so far. */
  def corpus(): Option[DataFrame] = Try(spark.read.parquet(corpusDir)).toOption
}
