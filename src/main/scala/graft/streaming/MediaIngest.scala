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
  *   1. decoded once into BOTH orientations' dHashes
  *      ([[Multimodal.imageHashesOriented]] — the only codec pass;
  *      everything downstream works on 64-bit hashes),
  *   2. near-deduped within the batch (greedy removal over the banded
  *      hamming pairs, same-orientation AND cross-orientation — a BMP
  *      and a PNG of one source decode to vertical mirrors, so the
  *      flipped hash is the cross-format duplicate signal),
  *   3. probed against the PERSISTED hash index: a batch asset either of
  *      whose orientation hashes is within hamming ≤ 3 of ANY admitted
  *      hash is rejected — this catches re-encoded (including
  *      format-changing BMP↔PNG), brightness-shifted, or lightly-edited
  *      duplicate images whose exact payload hashes all differ,
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
    // The pair search below routes persists through CacheRegistry; a
    // long-lived stream must release those per batch or pinned blocks and
    // registry entries accumulate forever (only bench/verify call
    // releaseAll). Scope-release everything this batch creates once its
    // outputs are materialized.
    val cacheMark = graft.operators.CacheRegistry.mark()
    val hashes = Multimodal.imageHashesOriented(spark, batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // within-batch, same orientation: greedy removal — higher id drops
    val sameOri = Multimodal.imageNearDupPairs(
        hashes.select(col("id"), col("h0"), col("h1")), maxHamming)
      .select(col("id_b").as("id"))
    // within-batch, cross-orientation: a flipped hash near ANOTHER
    // asset's top-down hash means the two payloads are mirror-storage
    // re-encodes of one source (see Multimodal.dHashOf). Banded the same
    // way; per-id (not distinct-value) banding is fine at micro-batch
    // sizes. Higher id drops, matching the greedy rule above.
    val flipBands = Multimodal.hashBands(hashes.select(
        col("id").as("id_f"), col("f0").as("h0"), col("f1").as("h1")))
      .withColumnRenamed("h0", "fh0").withColumnRenamed("h1", "fh1")
    val canonBands = Multimodal.hashBands(
      hashes.select(col("id").as("id_c"), col("h0"), col("h1")))
    val crossOri = flipBands.join(canonBands, Seq("band_id", "band_key"))
      .where(col("id_f") =!= col("id_c"))
      .where(expr(s"bit_count(fh0 ^ h0) + bit_count(fh1 ^ h1) <= $maxHamming"))
      .select(greatest(col("id_f"), col("id_c")).as("id"))
    val inBatch = hashes.join(
      sameOri.union(crossOri).distinct(), Seq("id"), "left_anti")
    // index probe: batch DISTINCT hash values — BOTH orientations, so a
    // cross-format re-encode of an admitted asset is caught even though
    // the index stores only canonical (top-down) hashes — banded against
    // the index.
    val admitted = existingIndex() match {
      case None => inBatch
      case Some(idx) =>
        val probe = Multimodal.hashBands(
          inBatch.select(col("h0"), col("h1"))
            .union(inBatch.select(col("f0").as("h0"), col("f1").as("h1")))
            .distinct())
        val indexed = Multimodal.hashBands(
            idx.select(col("h0"), col("h1")).distinct())
          .withColumnRenamed("h0", "i_h0").withColumnRenamed("h1", "i_h1")
        val hotValues = probe.join(indexed, Seq("band_id", "band_key"))
          .where(expr(s"bit_count(h0 ^ i_h0) + bit_count(h1 ^ i_h1) <= $maxHamming"))
          .select(col("h0"), col("h1")).distinct()
        val hotIds = inBatch.select(col("id"), col("h0"), col("h1"))
          .union(inBatch.select(col("id"), col("f0").as("h0"), col("f1").as("h1")))
          .join(hotValues, Seq("h0", "h1"))
          .select("id").distinct()
        inBatch.join(hotIds, Seq("id"), "left_anti")
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
    graft.operators.CacheRegistry.releaseSince(cacheMark, spark)
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
