package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** BPE merge training (Sennrich et al. 2016) — the tokenizer-training stage
  * of a data pipeline, in the shape real trainers use at scale: ONE corpus
  * pass aggregates word frequencies, then every merge iteration runs over
  * the distinct-word table only (vocabulary is metadata-scale: bounded by
  * language, not corpus size — the same argument as [[Vocabulary]]).
  *
  * Words are kept as space-separated symbol strings (" l o w e r " with
  * sentinel spaces); a merge rewrites them with a LITERAL replace — both
  * Spark's `replace` and DuckDB's replace substitute leftmost
  * non-overlapping occurrences, so greedy BPE merging ("a a a" + (a,a) →
  * "aa a") is identical across engines, with no regex-metacharacter
  * hazards. Pair selection is max count with smallest-(left,right)
  * lexicographic tie-break, computed as ONE declarative aggregate —
  * min over struct(−cnt, left, right) (r17; struct comparison is
  * field-lexicographic, so minimizing −cnt is exactly max-count with the
  * lexicographic tie-break — no order-dependent reduction anywhere).
  */
object Bpe {

  /** Distinct words with frequencies and initial character-symbol strings.
    * The only corpus-scale operation: one explode + one hash aggregation
    * keyed by word.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(lit(" "),
          concat_ws(" ", split(col("word"), "")), lit(" ")).as("syms"))

  /** Pair counts over the current symbolization, weighted by word freq. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(trim(col("syms")), " ")
    words
      .select(col("freq"), explode(
        arrays_zip(slice(syms, lit(1), size(syms) - 1).as("l"),
          slice(syms, lit(2), size(syms) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Run `merges` BPE iterations over the corpus; returns the merge table
    * (step [1-based], left, right, pair_count) — the artifact a tokenizer
    * ships. Deterministic under any partitioning.
    */
  def fit(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    train(docs, textCol, merges)._1

  /** The corpus is scanned ONCE ([[wordTable]], persisted); every merge
    * iteration then runs on the cached vocabulary and collects exactly one
    * row (the winning pair) to the driver — bounded driver state, the
    * standard coordination shape of distributed BPE trainers. Without the
    * persist each iteration would lazily recompute the whole corpus pass
    * (M extra full scans at 100 TB).
    */
  private def train(docs: DataFrame, textCol: String, merges: Int)
      : (DataFrame, DataFrame) = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).trackedCache
    // The superseded generation's cache is released one iteration LATE
    // (r18): iteration i+1's argmax collect materializes generation i+1's
    // cache as a side effect of scanning it, so the explicit
    // next.count() job that existed only to materialize-before-unpersist
    // is gone — one job per merge instead of two. At most two
    // vocabulary-scale word tables are live at once (registry-released).
    var prev: DataFrame = null
    val mergeRows = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to merges) {
      // r17 optimization (guide §2.4): the winning pair used to be found as
      // crossJoin(broadcast(max(cnt))) → filter → min(struct) — the pair
      // table was AGGREGATED TWICE per iteration (once under the broadcast
      // max, once post-filter) plus a broadcast-exchange job. max-count
      // with smallest-(left,right) tie-break is expressible as ONE
      // declarative aggregate: min over struct(−cnt, left, right) — the
      // same total order (struct comparison is field-lexicographic, and
      // min over −cnt is max over cnt), so the selected pair is identical.
      val best = pairCounts(words)
        .agg(min(struct((-col("cnt")).as("nc"), col("left"), col("right"),
          col("cnt"))).as("b"))
        .select(col("b.left"), col("b.right"), col("b.cnt"))
        .collect().head
      // the collect above materialized the current generation's cache, so
      // the one before it can no longer be recomputed through — release it
      if (prev != null) { prev.unpersist(); prev = null }
      if (!best.isNullAt(0)) { // no pairs left: every word is one symbol
        val (l, r) = (best.getString(0), best.getString(1))
        mergeRows += ((step.toLong, l, r, best.getLong(2)))
        val next = words.select(col("word"), col("freq"),
          replace(col("syms"), lit(s" $l $r "), lit(s" $l$r ")).as("syms"))
          .trackedCache
        prev = words
        words = next
      }
    }
    (mergeRows.result().toDF("step", "left", "right", "pair_count"), words)
  }

  /** Symbolization of every word after [[fit]]'s merges — the trained
    * tokenizer applied back to the vocabulary (join a corpus token stream
    * against this to tokenize at scale).
    */
  def symbolized(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    train(docs, textCol, merges)._2
      .select(col("word"), col("freq"), trim(col("syms")).as("syms"))

  /** Apply the trained tokenizer to the corpus: per-doc subword statistics
    * via a BROADCAST join of the token stream against the symbolized
    * vocabulary — the vocabulary is bounded by language, not corpus size
    * (the [[Vocabulary]] argument), so tokenization is a map-side pass with
    * one doc-keyed aggregation shuffle.
    */
  def tokenize(docs: DataFrame, textCol: String, idCol: String,
      merges: Int): DataFrame = {
    val vocab = symbolized(docs, textCol, merges)
      .select(col("word"), size(split(col("syms"), " ")).cast("long").as("_units"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(vocab), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("_units")).as("n_units"))
      .select(col(idCol), col("n_words"), col("n_units"),
        (col("n_units").cast("double") / col("n_words").cast("double"))
          .as("units_per_word"))
  }
}
