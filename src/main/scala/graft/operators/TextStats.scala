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

  /** Bulk rolling-hash fingerprint. The sequential fold
    * h = fold((acc*31 + v_i) mod p) over tokens equals
    * Σ v_i · 31^(n-1-i) mod p, so it decomposes into a broadcast join
    * against a tiny precomputed powers table + a grouped sum — fully
    * codegen'd, order-independent, one shuffle keyed by doc (the
    * per-element interpreted HOF fold was the corpus-scan bottleneck).
    * Identical values to TextFunctions.fingerprint (and the oracle's
    * list_reduce). Docs longer than maxTokens would lose terms — sized
    * well above any realistic document's whitespace-token count.
    */
  def fingerprintBulk(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, maxTokens: Int = 65536): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    val powers = Iterator.iterate(1L)(acc => acc * 31L % P).take(maxTokens).toSeq
    val powDf = powers.zipWithIndex.map { case (pw, k) => (k, pw) }.toDF("e", "pw")
    docs
      .select(col(idCol), size(split(col(textCol), " ")).as("n"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .select(col(idCol),
        (col("n") - 1 - col("pos")).as("e"),
        (length(col("tok")).cast("long") * 131L + ascii(col("tok"))).as("v"))
      .join(broadcast(powDf), "e")
      .groupBy(col(idCol))
      .agg((sum(col("v") * col("pw") % P) % P).as("fp"))
  }

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
