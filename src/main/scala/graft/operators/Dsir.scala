package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
  * score every raw document by how much more likely its content is under a
  * TARGET distribution (a trusted, high-quality split) than under the RAW
  * crawl distribution, estimated with hashed bag-of-unigram models:
  *
  *   logw(doc) = Σ_tok [ ln p̂_target(bucket(tok)) − ln p̂_raw(bucket(tok)) ]
  *
  * with add-one smoothing over B hash buckets. High-weight docs "look like"
  * the target; selection takes the top slice by weight (the paper's Gumbel
  * resampling noise is replaced by the weight-ordered take, keeping the
  * operator RNG-free, repartition-stable and oracle-checkable — the same
  * determinism trade [[Sampling.weightedMix]] makes).
  *
  * Determinism discipline: tokens hash through the portable 60-bit md5
  * bucket ([[QualityClassifier.bucketOf]]); every probability is a ratio of
  * exact integers, and each per-token log-ratio is quantized to 1e-6 nats
  * BEFORE the per-doc sum ([[NgramLm]]'s rule), so doc scores are order-free
  * integer sums — bit-identical across engines and partitionings.
  *
  * Scale shape: two count aggregations keyed by bucket (≤ B rows of state
  * each), a broadcast of the B-row log-ratio table, one doc-keyed sum.
  * Nothing but the scans grows with the corpus; the target split is
  * fixed-size in the DSIR regime.
  */
object Dsir {

  private def toks(df: DataFrame, textCol: String, cols: Seq[String]) =
    df.select(cols.map(col) :+ explode(split(col(textCol), " ")).as("tok"): _*)

  /** The B-row importance table: (bucket, lw_q) where lw_q is the
    * 1e-6-quantized ln(p̂_target/p̂_raw) for that bucket. Buckets absent
    * from the raw corpus are irrelevant (no raw token can hit them).
    */
  def bucketWeights(raw: DataFrame, target: DataFrame, textCol: String,
      nBuckets: Int = 1024): DataFrame = {
    val rawB = toks(raw, textCol, Nil)
      .select(QualityClassifier.bucketOf(col("tok"), nBuckets))
    val tgtB = toks(target, textCol, Nil)
      .select(QualityClassifier.bucketOf(col("tok"), nBuckets))
    // Persisted (≤ B rows each): the bucket-count tables feed both the
    // ratio join and the totals — and totals derive from them (nr = Σ cr)
    // instead of a second corpus-wide token scan.
    val rc = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
      .trackedCache
    val tc = tgtB.groupBy("bucket").agg(count(lit(1)).as("ct"))
      .trackedCache
    val totals = rc.agg(sum(col("cr")).as("nr"))
      .crossJoin(broadcast(tc.agg(sum(col("ct")).as("nt"))))
    rc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log((col("ct") + 1L).cast("double") /
                   (col("nt") + nBuckets).cast("double")) -
               log((col("cr") + 1L).cast("double") /
                   (col("nr") + nBuckets).cast("double"))) * lit(1e6) +
          lit(0.5)).cast("long").as("lw_q"))
  }

  /** Per-doc importance weights over the raw corpus:
    * (idCol, n_tok, w_q = Σ lw_q, logw = w_q/1e6). One bucket-keyed
    * broadcast join + one doc-keyed sum.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, nBuckets: Int = 1024): DataFrame = {
    val lw = bucketWeights(raw, target, textCol, nBuckets)
    toks(raw, textCol, Seq(idCol))
      .withColumn("bucket", QualityClassifier.bucketOf(col("tok"), nBuckets))
      .join(broadcast(lw), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("lw_q")).as("w_q"))
      .withColumn("logw", col("w_q").cast("double") / lit(1e6))
  }

  /** Deterministic resampling: the `take` highest-weight docs (ties broken
    * by id). A TakeOrderedAndProject at any scale — no global sort
    * materializes.
    */
  def select(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, take: Int, nBuckets: Int = 1024): DataFrame =
    importanceWeights(raw, target, textCol, idCol, nBuckets)
      .orderBy(col("w_q").desc, col(idCol)).limit(take)
}
