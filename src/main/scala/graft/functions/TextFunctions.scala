package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID scoring, quality scoring, token
  * counting, and document fingerprinting. All are pure Catalyst expressions
  * (higher-order functions, no UDFs) so they vectorize under whole-stage
  * codegen and are portable to the DuckDB oracle for the t2 gate.
  */
object TextFunctions {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (default n=3): positions i..i+n-1 joined by a
    * space; empty array when the document is shorter than n tokens.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array())
  }

  /** Tiny deterministic English stopword list used by the lang-ID heuristic.
    * (The reference enriches wiki codes to language names client-side,
    * store.js:29-54; here the analogue is corpus-level language detection.)
    */
  val englishMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Fraction of tokens that are English marker words. */
  def englishScore(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isInCollection(englishMarkers))).cast("double") /
      size(t).cast("double")
  }

  /** Heuristic language ID: n-gram/stopword scoring thresholded at 5%. */
  def langId(text: Column): Column =
    when(englishScore(text) >= 0.05d, lit("en")).otherwise(lit("unk"))

  /** Quality score in [0,1]: blends normalized length, mean token length and
    * stopword ratio — the classic cheap pre-filter for training corpora.
    * Integer-derived double arithmetic only (deterministic cross-engine).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val meanTokLen = (length(text).cast("double") - (nTok - 1)) / nTok
    val lenScore = least(nTok / 100.0d, lit(1.0d))
    val tokScore = least(meanTokLen / 8.0d, lit(1.0d))
    val stopScore = least(englishScore(text) * 5.0d, lit(1.0d))
    (lenScore + tokScore + stopScore) / 3.0d
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: each token contributes ceil(len/4) pieces
    * (spelled floor((len+3)/4.0) — exact for any realistic token length).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text),
      lit(0L),
      (acc, t) => acc + floor((length(t) + 3).cast("double") / 4.0d).cast("long"))

  /** Rolling polynomial fingerprint over tokens:
    * h = fold(h * 31 + (len(tok)*131 + codepoint(tok[0]))) mod 1e9+7.
    * A strict left-to-right fold — same sequence as the oracle's
    * `list_reduce`.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text),
      lit(0L),
      (acc, t) =>
        (acc * 31L + (length(t).cast("long") * 131L + ascii(t))) % 1000000007L)
}
