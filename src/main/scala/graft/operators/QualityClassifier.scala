package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature linear classifier inference — the fastText-style quality
  * gate of a curation pipeline (CCNet / Llama-recipe style: a small linear
  * model over hashed token n-grams decides keep vs drop). This implements
  * the INFERENCE side at corpus scale; weights arrive as a (bucket,
  * weight_m) table from whatever offline trainer produced them
  * ([[defaultWeights]] is a deterministic stand-in).
  *
  * Determinism discipline: features hash through the portable 60-bit md5
  * prefix (identical in any engine), weights are integer MILLI-units so
  * per-doc sums are order-free, and the final margin is one exact integer
  * ratio — the same posture as the LM scorer.
  *
  * Scale shape: feature explosion is a map; the weight table is fixed
  * cardinality (nBuckets rows) and explicitly broadcast — the scoring pass
  * is map-side only; the single shuffle is the per-doc aggregation.
  */
object QualityClassifier {

  /** Portable feature bucket: 60-bit md5 prefix mod nBuckets. */
  def bucketOf(c: Column, nBuckets: Int): Column =
    (conv(substring(md5(c), 1, 15), 16, 10).cast("long") % nBuckets).as("bucket")

  /** Deterministic stand-in weight table (bucket, w_m) — milli-weights in
    * [-999, 999] from a small affine hash of the bucket id.
    */
  def defaultWeights(spark: SparkSession, nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(col("id").as("bucket"),
      ((col("id") * 37L + 11L) % 1999L - 999L).as("w_m"))

  /** Per-doc margin over unigram + bigram hashed features:
    * (doc, n_feats, margin_m = Σ w_m, score = margin_m/1000/n_feats,
    * label = keep iff score > 0). Empty docs have no features and are
    * absent; unseen buckets carry weight 0 via the left join.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, nBuckets: Int): DataFrame = {
    val unigrams = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("feat"))
    val bigrams = Shingles.exploded(docs, textCol, idCol, n = 2)
      .select(col(idCol), col("shingle").as("feat"))
    unigrams.union(bigrams)
      .select(col(idCol), bucketOf(col("feat"), nBuckets))
      .join(broadcast(weights), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("w_m"), lit(0L)).as("w_m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_m")).as("margin_m"))
      .select(col(idCol), col("n_feats"), col("margin_m"),
        (col("margin_m").cast("double") / lit(1000.0) / col("n_feats").cast("double"))
          .as("score"),
        when(col("margin_m") > 0L, lit("keep")).otherwise(lit("drop")).as("label"))
  }
}
