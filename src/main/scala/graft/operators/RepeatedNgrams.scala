package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** ExactSubstr-style repeated-sequence detection (the substring-dedup regime
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"): n-grams that occur at least `minCount` times CORPUS-WIDE are
  * memorization-prone boilerplate; every occurrence is located and
  * overlapping/adjacent hits coalesce into maximal per-document spans — the
  * unit a masking/excision pass removes.
  *
  * Differs from [[Decontamination.contaminatedSpans]] in both the hit
  * source (corpus self-frequency, not an eval vocabulary) and the merge
  * rule (interval overlap-merge, not consecutive-run: two hits `n-1`
  * positions apart still fuse because their token intervals touch).
  *
  * Scale shape: one shuffle keyed by shingle for the frequency count
  * (partial aggregation absorbs hot-shingle skew), one shingle-keyed join
  * to flag hits (AQE may broadcast the hot set — it is the corpus's
  * FREQUENT n-grams, bounded far below data size), then one doc-keyed
  * shuffle for the per-doc interval merge windows. No global window, no
  * product.
  */
object RepeatedNgrams {

  /** Maximal spans (doc, span_start, span_end, span_tokens, n_grams) of
    * positions covered by corpus-frequent n-grams; `[span_start, span_end)`
    * in 0-based token positions.
    */
  def repeatedSpans(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 5, minCount: Long = 3): DataFrame = {
    // Persisted: the positioned n-gram stream feeds the frequency floor AND
    // the hit join — uncached, the corpus shingle pass runs twice.
    val grams = Shingles.hashedWithPos(docs, textCol, idCol, n)
      .trackedCache
    val hot = grams.groupBy(col("shingle"))
      .agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") >= minCount)
      .select("shingle")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(hot, "shingle")
      .select(col(idCol), col("pos"))
      // interval overlap-merge: a hit opens a new span iff it starts past
      // the furthest end seen so far in this doc
      .withColumn("_prev_end",
        max(col("pos") + lit(n)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_prev_end").isNull || col("pos") > col("_prev_end"), 1L)
          .otherwise(0L))
      .withColumn("_grp",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_grp"))
      .agg(min(col("pos")).as("span_start"),
        max(col("pos") + lit(n)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"),
        col("n_grams"))
  }
}
