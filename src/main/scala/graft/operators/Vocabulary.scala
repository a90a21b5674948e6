package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary building + token-id mapping — the text→ids stage of a
  * training pipeline: terms above a document-frequency floor get dense ids
  * ordered by (count desc, term); everything else maps to the OOV id 0.
  *
  * Scale shape: the vocabulary is an AGGREGATE of the corpus, usually
  * language-bounded — but web-scale corpora grow noise vocabularies into
  * the 10^8 range, so id assignment uses the distributed two-pass rank
  * ([[Sampling.globalRank]], round 3) instead of a single-task global
  * window; the id mapping then broadcasts back to the token stream
  * (fixed-cardinality dim join, the same posture as the ISO-639 tables).
  */
object Vocabulary {

  /** (term, term_id, cnt), ids 1..V by (cnt desc, term). */
  def build(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    Sampling.globalRank(counts, Seq(col("cnt").desc, col("term")))
      .select(col("term"), (col("rank0") + 1L).as("term_id"), col("cnt"))
  }

  /** Vocab sizes the broadcast fast path accepts by default: a min-count
    * natural-language vocab is a few MB; web-scale noise vocabularies (10^8
    * types) blow past any executor and take the sharded path.
    */
  val BroadcastMaxBytes: Long = 64L << 20

  /** Size-based switch for the vocab join strategy: the optimizer's
    * estimated size is free (no job) and errs conservative for aggregates —
    * a caller who KNOWS can force either path via the `sharded` parameter.
    */
  private[graft] def autoSharded(vocab: DataFrame, maxBytes: Long): Boolean =
    vocab.queryExecution.optimizedPlan.stats.sizeInBytes > maxBytes

  /** Map each document's tokens to vocabulary ids (OOV → 0); output one
    * row per (doc, position).
    *
    * Join strategy: the default BROADCASTS the vocab dim (requires
    * vocab-fits-an-executor); past `broadcastMaxBytes` — or when forced via
    * `sharded = Some(true)` — the vocab is HASH-PARTITIONED on term and
    * joined map-side per shard (shuffle-hash: each task builds a hash map of
    * its vocab shard only), so no single JVM ever holds the whole
    * vocabulary. Output rows are identical either way (VocabularySpec).
    */
  def mapTokens(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, sharded: Option[Boolean] = None,
      broadcastMaxBytes: Long = BroadcastMaxBytes): DataFrame = {
    val dim = vocab.select("term", "term_id")
    val tokens = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    val joined =
      if (sharded.getOrElse(autoSharded(dim, broadcastMaxBytes)))
        tokens.join(dim.hint("shuffle_hash"), Seq("term"), "left")
      else tokens.join(broadcast(dim), Seq("term"), "left")
    joined.select(col(idCol), col("pos").cast("long").as("pos"),
      coalesce(col("term_id"), lit(0L)).as("term_id"))
  }

  /** Per-source vocabulary coverage — the tokenizer-QA report run before
    * committing a vocab to a training run: token coverage ratio (what
    * fraction of the source's token stream the vocab can express) and the
    * count of distinct out-of-vocabulary types. Same broadcast posture as
    * [[mapTokens]] (a min-count-floored natural-language vocab is
    * metadata-scale); the token stream is never re-aggregated per term —
    * one explode, one left join, one source-keyed aggregate.
    */
  def coverageReport(docs: DataFrame, textCol: String, srcCol: String,
      vocab: DataFrame): DataFrame =
    docs
      .select(col(srcCol).as("source"), explode(split(col(textCol), " ")).as("term"))
      .join(broadcast(vocab.select(col("term"), lit(1L).as("in_vocab"))),
        Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("covered_tokens"),
        countDistinct(when(col("in_vocab").isNull, col("term"))).as("oov_types"))
      .select(col("source"), col("n_tokens"), col("covered_tokens"),
        (col("covered_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"),
        col("oov_types"))
}
