package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** Corpus ranking / search-index construction — the retrieval side of a
  * training-data platform (quality-weighted sampling, dedup triage, eval
  * retrieval all sit on a BM25-ish score + an inverted index).
  *
  * BM25 here uses the RAW rational idf (N - df + 0.5)/(df + 0.5) rather
  * than its logarithm: every input is an exact integer (tf, df, dl, N), so
  * the whole score is a fixed tree of IEEE ops and reproduces bit-exactly
  * on any engine — `ln` is only ~1-ulp-accurate and engine-dependent, which
  * would break cross-engine verification. Monotonicity (what ranking needs)
  * is unchanged; callers wanting the classical value can take ln of the
  * reported idf.
  *
  * Plan shape: one (doc, term) aggregation feeds tf; dl and df derive from
  * it with doc-/term-keyed shuffles; N and avgdl are a 1-row broadcast.
  * Nothing is all-pairs, no window is global.
  */
object Ranking {

  /** Per-(term, doc) BM25 components: (term, id, tf, dl, df, idf, bm25). */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Persisted: tf feeds the corpus stats AND the scored stream — without
    // the cache the corpus-wide explode+aggregate runs twice (measured
    // 10 s at sf1 with three uncached consumers, round 4).
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .trackedCache
    // dl and df as WINDOW aggregates instead of aggregate+self-join: the
    // former plan exchanged the full (doc, term) stream once to BUILD each
    // side table and once more to JOIN it back (per key); the unbounded
    // windows attach the same exact integers with one exchange per key and
    // no join operators, and the term partitioning is exactly what xq44's
    // ranking window wants next. Round-6 measured: 3.97 -> 3.80 s solo at
    // sf1 — a wash in wall-clock (the query is exchange-bound either way);
    // kept for the structurally simpler plan (two fewer join operators,
    // one fewer tf consumer). Values are identical — same counts, same
    // IEEE tree.
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val corpus = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"))
    val idf = (col("n").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    tf.withColumn("dl", sum(col("tf")).over(wDoc))
      .withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(corpus))
      .select(col("term"), col(idCol), col("tf"), col("dl"), col("df"),
        idf.as("idf"),
        ((idf * (col("tf").cast("double") * lit(k1 + 1))) / denom).as("bm25"))
  }

  /** Persist the BM25 posting index at `dir` — the BUILD-ONCE half of the
    * amortized retrieval regime ([[bm25]] recomputes tf/dl/df per call, the
    * strict-measurement shape; a production pipeline builds this once per
    * corpus snapshot and serves every query from it):
    *
    *   - `dir/postings` — (term, id, tf, dl), clustered by term with
    *     term-sorted row groups so a query's `term IN (...)` scan gets
    *     parquet min/max pruning (the columnar analogue of a posting list
    *     seek),
    *   - `dir/dfs`      — (term, df),
    *   - `dir/stats`    — one row (n, avgdl).
    *
    * All stored columns are exact integers except avgdl (one IEEE divide),
    * so a probe reproduces [[bm25]]'s scores bit-exactly.
    */
  def writeBm25Index(docs: DataFrame, textCol: String, idCol: String,
      dir: String): Unit = {
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      tf.withColumn("dl", sum(col("tf")).over(wDoc))
        .repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$dir/postings")
      tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$dir/dfs")
      tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
        .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
    } finally tf.unpersist()
  }

  /** Score one query (a literal term set) against a persisted
    * [[writeBm25Index]] index: per-doc score = the FIXED-ORDER sum of the
    * per-term BM25 contributions in the caller's term order (missing terms
    * contribute 0.0) — a fixed IEEE expression tree, so the score is
    * engine-reproducible without any double-sum aggregation (the repo's
    * cross-engine discipline; see [[bm25]]'s idf note).
    *
    * Plan: the postings scan is filtered to the query's terms (pushed to
    * parquet, pruned by the term-sorted row groups), dfs and the 1-row stats
    * are broadcast, and the only shuffle is the doc-keyed aggregate over the
    * matching postings — O(Σ df(term)) rows, never the corpus.
    */
  def scoreBm25Index(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      terms: Seq[String], idCol: String = "doc_id",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "scoreBm25Index needs at least one term")
    // The score is the sum of DISTINCT term contributions; a duplicated
    // entry would get its own _b$i column over the same postings rows and
    // silently score 2x. Enforce the documented term-SET contract.
    require(terms.distinct.size == terms.size,
      s"scoreBm25Index terms must be distinct, got duplicates: " +
        terms.diff(terms.distinct).distinct.mkString(", "))
    val postings = spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*))
    val dfs = spark.read.parquet(s"$indexDir/dfs")
      .where(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$indexDir/stats")
    val idf = (col("n").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val scored = postings
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        ((idf * (col("tf").cast("double") * lit(k1 + 1))) / denom).as("bm25"))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("bm25"))).as(s"_b$i")
    }
    scored.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol),
        terms.indices.map(i => coalesce(col(s"_b$i"), lit(0.0)))
          .reduce(_ + _).as("score"))
  }

  /** Inverted index: per term, document frequency and the posting list of
    * the first `maxPostings` doc ids (ascending, comma-joined). Postings at
    * real scale are stored columnar per term-shard; the bounded CSV form
    * here is the portably-comparable surface.
    */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      maxPostings: Int = 10): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(
          slice(transform(array_sort(collect_list(col(idCol))),
            x => x.cast("string")), 1, maxPostings), ",").as("postings"))
}
