package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** N-gram language-model quality scoring — the model-based filtering stage
  * of a training pipeline (the CCNet recipe: score every crawled document
  * by its perplexity under a small LM trained on a trusted reference
  * corpus; low-likelihood docs are junk, suspiciously-low-perplexity docs
  * are boilerplate).
  *
  * The LM is an add-one-smoothed bigram model:
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
  * with V the reference vocabulary size and c(w1 ·) the count of positions
  * where w1 has a successor — both pure integer counts, so every
  * probability is a ratio of integers and bit-identical across engines and
  * partitionings.
  *
  * Scoring sums −ln P per bigram, QUANTIZED to 1e-6 nats per term before
  * the sum (floor(x·1e6 + 0.5) as long): integer sums are order-free, so
  * the doc score is deterministic under any parallelism — the same
  * discipline as the k-means trainer's coordinate sums.
  *
  * Scale shape: LM counts are two hash aggregations keyed by bigram /
  * context (partial aggregation absorbs Zipfian skew). Scoring joins the
  * corpus bigram stream against the count tables keyed the same way; the
  * reference corpus is fixed-size in the CCNet regime, so at 100 TB those
  * count tables are broadcast candidates — left to AQE since the tables
  * here scale with SF. Per-doc assembly is one doc-keyed shuffle.
  */
object NgramLm {

  /** (w1, w2) pairs of consecutive tokens per doc — built from the token
    * array with a narrow `transform(sequence)` generate (round 3; the old
    * posexplode + window-`lead` form shuffled and sorted every corpus token
    * by doc id just to read each token's successor — the same scale-killer
    * shape Shingles.explodedWithPos dropped).
    */
  private def bigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    // Native one-pass bigram builder: the transform(sequence(...)) HOF form
    // this replaces ran interpreted per document and dominated xq48 at sf1
    // (same promotion as TextRules). Documents with < 2 tokens emit an
    // empty array, so explode drops them — the old `where(size >= 2)`.
    docs.select(col(idCol),
        explode(graft.expressions.TokenBigrams(col(textCol))).as("_b"))
      .select(col(idCol), col("_b.w1").as("w1"), col("_b.w2").as("w2"))

  /** Train the bigram LM: returns (bigram counts, context counts, V). */
  def fit(train: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bg = bigrams(train, textCol, idCol)
    // Persisted: the bigram count table feeds the context-count aggregation
    // AND the scoring join — uncached, the reference-corpus bigram pass
    // runs twice (the xq24/xq44 repeated-consumer pattern).
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .trackedCache
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val v = train
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    (c12, c1, v)
  }

  /** Score `docs` under the LM trained on `train`:
    * (doc, n_bigrams, nll_q = Σ floor(−ln P · 1e6 + 0.5), avg_nll).
    * Docs with fewer than two tokens have no bigrams and are absent.
    */
  def scoreDocs(train: DataFrame, docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val (c12, c1, v) = fit(train, textCol, idCol)
    val p = (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")
    bigrams(docs, textCol, idCol)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        floor(-log(p) * lit(1e6) + lit(0.5)).cast("long").as("_q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_q")).as("nll_q"))
      .select(col(idCol), col("n_bigrams"), col("nll_q"),
        (col("nll_q").cast("double") / lit(1e6) / col("n_bigrams").cast("double"))
          .as("avg_nll"))
  }
}
