package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bulk per-document token statistics via explode + grouped aggregation.
  *
  * The scalar TextFunctions forms (filter/aggregate higher-order functions)
  * are interpreted per element — fine for composition and small data, ~100x
  * too slow for corpus-scale scans. This operator computes the same numbers
  * in one codegen'd pass: explode tokens → group by doc → count /
  * conditional count / subword sum. One narrow shuffle keyed by doc id;
  * at 100 TB this is the shape you want (map-side partial aggregation
  * collapses the token stream before the exchange).
  *
  * Output per doc: text_len, n_tokens, n_stop, n_subwords — exactly the
  * values the scalar forms produce (verified by the oracle hash-match of
  * xq10-xq12).
  */
object TextStats {

  def perDoc(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), length(col(textCol)).as("text_len"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("text_len"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("tok").isInCollection(TextFunctions.englishMarkers), 1))
          .as("n_stop"),
        sum(floor((length(col("tok")) + 3).cast("double") / 4.0d).cast("long"))
          .as("n_subwords"))

  /** Bulk rolling-hash fingerprint — the native TokenFoldHash expression:
    * one codegen'd pass over the raw bytes per document, no explode, no
    * join, no aggregate exchange. (The first version decomposed the fold
    * into a posexplode + broadcast powers-table join + grouped sum; correct,
    * but it paid a Generate + join + exchange per token and benched 73x the
    * DuckDB baseline — the per-row narrow map below is the plan a scan of
    * this kind should have.) Identical values to TextFunctions.fingerprint
    * and the oracle's list_reduce.
    */
  def fingerprintBulk(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
      graft.expressions.TokenFoldHash(col(textCol)).as("fp"))

  /** englishScore / langId / qualityScore derived from the stats — same
    * IEEE arithmetic as the TextFunctions scalar forms.
    */
  def withScores(stats: DataFrame): DataFrame = {
    val nt = col("n_tokens").cast("double")
    val score = col("n_stop").cast("double") / nt
    val meanTokLen = (col("text_len").cast("double") - (nt - 1)) / nt
    stats
      .withColumn("score", score)
      .withColumn("pred_lang", when(score >= 0.05d, "en").otherwise("unk"))
      .withColumn("quality",
        (least(nt / 100.0d, lit(1.0d)) +
          least(meanTokLen / 8.0d, lit(1.0d)) +
          least(score * 5.0d, lit(1.0d))) / 3.0d)
  }
}
