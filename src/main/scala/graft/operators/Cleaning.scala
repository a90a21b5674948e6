package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based corpus cleaning — the two canonical published rulesets web
  * pipelines run before any model-based filtering:
  *
  *  - C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
  *    Transfer Learning", §2.2): keep only lines that read like prose
  *    (terminal punctuation, a minimum word count, no code braces, no
  *    boilerplate phrases), reassemble documents from the survivors, drop
  *    documents left with too few lines.
  *  - Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
  *    table A1): document-level bounds on word count, mean word length,
  *    symbol-to-word ratio, bullet/ellipsis line ratios, alphabetic-word
  *    ratio and stop-word presence.
  *
  * Both are LINE/DOC-LOCAL: pure one-pass column programs over higher-order
  * array functions — no explode, no join, no shuffle of any kind. At 100 TB
  * this whole family is a single scan wave that saturates I/O (the same
  * class as xq10-12's text stats; see SCALING.md "Scan-shaped").
  *
  * Every derived number is an integer or a ratio of integers, so results
  * hash-match the DuckDB oracle bit-exactly (no rounding discipline needed).
  */
object Cleaning {

  /** Boilerplate phrases whose presence (case-insensitive) kills a line —
    * C4's citation/JS/policy blocklist, trimmed to the portable core.
    */
  val defaultBlocklist: Seq[String] =
    Seq("javascript", "cookie policy", "lorem ipsum", "privacy policy",
      "terms of use")

  /** C4 line filter: split on newlines, keep prose-like lines (terminal
    * punctuation, >= minWords words, no '{', no blocklist phrase),
    * reassemble in original order, drop docs with fewer than `minLines`
    * survivors. Output: (idCol, n_lines, n_kept, clean_text).
    *
    * The per-line verdicts run inside [[graft.expressions.C4LineStats]] —
    * one codegen'd byte pass per document instead of interpreted
    * `filter(split(...))` HOF lambdas (which dominated xq64 at sf1).
    */
  def c4LineFilter(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 5, minLines: Int = 2,
      blocklist: Seq[String] = defaultBlocklist): DataFrame = {
    docs
      .select(col(idCol),
        graft.expressions.C4LineStats(col(textCol), minWords, blocklist)
          .as("_s"))
      // nondeterministic no-op column: stops PushPredicateThroughNonJoin
      // from substituting the filter below this projection, which would
      // re-evaluate the full line pass once in the Filter and once in the
      // Project (the predicate is not source-pushable anyway).
      .withColumn("_barrier", spark_partition_id())
      .select(col(idCol),
        col("_s.n_lines").as("n_lines"),
        size(col("_s.kept")).cast("long").as("n_kept"),
        array_join(col("_s.kept"), "\n").as("clean_text"))
      .where(col("n_kept") >= minLines)
  }

  /** Gopher's stop-word list (table A1): a document that never uses any of
    * these is unlikely to be running English prose.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules. Emits the raw per-doc statistics plus one 0/1
    * flag per rule and the overall `pass` — flags stay visible (not just a
    * filter) because pipelines tune thresholds by inspecting which rule
    * fires (longs, not booleans, for oracle-portable hashing).
    *
    * Rules (defaults are the paper's): word count in [minWords, maxWords];
    * mean word length in [minMeanWordLen, maxMeanWordLen]; symbol-to-word
    * ratio ('#' chars + '...' occurrences) below maxSymbolRatio; at most
    * maxBulletRatio of lines starting with a bullet; at most
    * maxEllipsisRatio of lines ending in '...'; at least minAlphaRatio of
    * words containing a letter; at least minStopwords distinct-position
    * stop-word hits.
    */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      minStopwords: Long = 2): DataFrame = {
    // All nine raw counts come from one codegen'd byte pass
    // (graft.expressions.GopherStats) — the interpreted filter/aggregate
    // HOF + per-word rlike form was xq65's entire 13.9 s at sf1. The
    // stats struct lives in its own projection so it is computed once
    // (CollapseProject keeps non-cheap multi-referenced aliases apart).
    val st = col("_gopher")
    val nWords = st.getField("n_words")
    val sumWordLen = st.getField("sum_word_len")
    val meanWordLen = sumWordLen.cast("double") / nWords.cast("double")
    val nHash = st.getField("n_hash")
    val nEllipsis = st.getField("n_ellipsis")
    val symbolRatio =
      (nHash + nEllipsis).cast("double") / nWords.cast("double")
    val nLines = st.getField("n_lines")
    val nBullet = st.getField("n_bullet")
    val nEllLine = st.getField("n_ell_line")
    val nAlpha = st.getField("n_alpha")
    val nStop = st.getField("n_stop")

    val flags = Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "r_word_len" ->
        (meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen),
      "r_symbol" -> (symbolRatio < maxSymbolRatio),
      "r_bullet" ->
        (nBullet.cast("double") / nLines.cast("double") <= maxBulletRatio),
      "r_ellipsis" ->
        (nEllLine.cast("double") / nLines.cast("double") <= maxEllipsisRatio),
      "r_alpha" ->
        (nAlpha.cast("double") / nWords.cast("double") >= minAlphaRatio),
      "r_stop" -> (nStop >= minStopwords))

    val base = docs
      .select(col(idCol),
        graft.expressions.GopherStats(col(textCol)).as("_gopher"))
      .select(
        (col(idCol) +:
          (nWords.as("n_words") :: meanWordLen.as("mean_word_len") ::
            symbolRatio.as("symbol_ratio") :: nStop.as("n_stop") ::
            flags.map { case (n, c) => when(c, 1L).otherwise(0L).as(n) }.toList))
          : _*)
    base.withColumn("pass",
      when(flags.map { case (n, _) => col(n) === 1L }.reduce(_ && _), 1L)
        .otherwise(0L))
  }
}
