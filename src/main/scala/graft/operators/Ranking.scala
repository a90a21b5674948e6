package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Plan shape (round 11): the whole per-document half — tf AND dl — is one
  * codegen'd row-local pass ([[graft.expressions.TermCounts]]: a document
  * is one row, so the (doc, term) aggregate the round-6 form shuffled is a
  * purely in-row computation). df is the only corpus-wide aggregate; its
  * output is VOCABULARY-bounded (distinct terms, not corpus rows), so
  * under a measured row gate it broadcasts back into the scored stream —
  * which therefore reaches the caller having never been exchanged.
  * Measured at sf5: the old (doc, term) hash aggregate alone was 7.5 s of
  * the 10.1 s query (StageProbe xq44v); N and avgdl are a 1-row broadcast.
  * Nothing is all-pairs, no window is global.
  */
object Ranking {

  /** df tables up to this many rows broadcast into the scored stream. Same
    * reasoning as NgramLm's count-table gate: df grows with VOCABULARY
    * (distinct terms), not corpus rows, so at any corpus size the table
    * stays broadcast-sized unless the tokenizer is degenerate; the gate is
    * a measured count over the already-cached tf stream, and an over-cap
    * vocabulary falls back to the keyed shuffle join.
    */
  private val BroadcastDfRows = 5000000L

  /** Corpus size and average document length WITHOUT touching the term
    * stream: a document's token count under split(s, " ") semantics is
    * exactly (#spaces + 1) — `length - length(translate(text, ' ', ''))`
    * counts spaces in pure codegen'd string ops, so n/avgdl is a map-only
    * scan aggregate (1 row out) instead of the doc-keyed aggregate over
    * the 30 M-row term stream it replaced (measured 3.3 s at sf5,
    * StageProbe xq44v). Same integers: Σ dl is Σ (#spaces + 1), and the
    * 0x20 byte never occurs inside a UTF-8 multi-byte sequence.
    */
  // sum_dl rides along as an exact long: avgdl is one IEEE divide and NOT
  // additive under corpus growth, but (n, sum_dl) are — appendBm25Index
  // merges the longs exactly and re-derives avgdl with the SAME single
  // divide a full rebuild performs, keeping probe scores bit-identical.
  private def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum((length(col(textCol)) -
          length(translate(col(textCol), " ", "")) + 1).cast("long")).as("sum_dl"))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).as("avgdl"),
        col("sum_dl"))

  /** Per-doc (doc_id, term, tf, dl) stream with NO exchange: term counts
    * and document length computed inside the document row.
    */
  private def termStream(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(graft.expressions.TermCounts(col(textCol))).as("_t"))
      .select(col(idCol), col("_t.term").as("term"), col("_t.tf").as("tf"),
        col("_t.dl").as("dl"))

  /** Per-(term, doc) BM25 components: (term, id, tf, dl, df, idf, bm25). */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Persisted: the stream feeds corpus stats, the df aggregate (and its
    // gate count), and the scored output — without the cache the
    // tokenize pass runs once per consumer.
    val tf = termStream(docs, textCol, idCol).trackedCache
    val corpus = corpusStats(docs, textCol)
    // Cached so the gate's count() and the broadcast exchange share ONE
    // aggregation run (uncached, the count action and the broadcast each
    // execute the df plan — measured 0.9 s per run at sf5).
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df")).trackedCache
    val dfJ = if (dfT.count() <= BroadcastDfRows) broadcast(dfT) else dfT
    val idf = (col("n").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    tf.join(dfJ, Seq("term"))
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
    val tf = termStream(docs, textCol, idCol)
      .select(col(idCol), col("term"), col("tf"), col("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      tf.repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$dir/postings")
      tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$dir/dfs")
      corpusStats(docs, textCol)
        .write.mode("overwrite").parquet(s"$dir/stats")
    } finally tf.unpersist()
  }

  /** Append-delta refresh of a [[writeBm25Index]] generation
    * (`IndexStore.ensureIncremental` buildDelta half). Postings are
    * append-only under corpus growth (a new document only ADDS posting
    * rows), so the prior generation's posting files carry over verbatim
    * (hard-linked) and only the appended batch is term-streamed — its rows
    * land in their own term-clustered sorted files, preserving per-file
    * min/max pruning exactly like `Dedup.appendBandIndex`. df counts and
    * (n, sum_dl) are additive and vocabulary-/1-row-bounded, so the merge
    * never touches the prior corpus text; avgdl is re-derived from the
    * exact merged longs with the same single IEEE divide a full rebuild
    * performs — probe scores stay bit-identical (xq107's oracle states
    * full-rebuild semantics; RankingSpec pins tables AND scores). stats/
    * is written last (the generation's ready marker).
    */
  def appendBm25Index(spark: org.apache.spark.sql.SparkSession,
      delta: IndexStore.AppendDelta, newDir: String,
      textCol: String, idCol: String): Unit = {
    val fresh = spark.read.parquet(delta.newFiles: _*)
    IndexStore.linkData(s"${delta.priorDir}/postings", s"$newDir/postings")
    val tf = termStream(fresh, textCol, idCol)
      .select(col(idCol), col("term"), col("tf"), col("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      tf.repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("append").parquet(s"$newDir/postings")
      spark.read.parquet(s"${delta.priorDir}/dfs")
        .unionByName(tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
        .repartition(col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$newDir/dfs")
      spark.read.parquet(s"${delta.priorDir}/stats")
        .unionByName(corpusStats(fresh, textCol))
        .agg(sum(col("n")).as("n"), sum(col("sum_dl")).as("sum_dl"))
        .select(col("n"),
          (col("sum_dl").cast("double") / col("n")).as("avgdl"),
          col("sum_dl"))
        .write.mode("overwrite").parquet(s"$newDir/stats")
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

  /** A BATCH of [[scoreBm25Index]] queries in ONE pass over the index
    * (r17, guide §2.4): the per-query form re-scanned postings, rebuilt
    * the dfs/stats broadcasts, and re-aggregated once per query — at a
    * 3-query serving batch that was 3 scan+broadcast+aggregate chains
    * (plus per-query single-partition windows in the callers) for one
    * probe. Here the query list becomes a broadcast (query_no, term, slot)
    * frame: postings are scanned once filtered to the UNION of the terms,
    * each posting row fans out to the queries containing its term, and one
    * (query_no, doc)-keyed aggregate pivots the per-slot contributions.
    * The score is the slot-ordered sum coalesce(b0,0)+...+coalesce(bN,0) —
    * EXACTLY the xq99/xq107 oracle's expression (its 3-slot CASE/COALESCE
    * sum), and bit-equal to the per-query form's caller-order sum: a
    * query's own slots produce the same operands in the same order, and
    * the padding `+ 0.0` for absent slots cannot change any IEEE double
    * that is not -0.0 (no BM25 contribution is -0.0: tf ≥ 1 and idf's
    * numerator n − df + 0.5 is never zero).
    * Returns (query_no, `idCol`, score) for docs matching ≥ 1 term.
    */
  def scoreBm25IndexBatch(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: Seq[(Long, Seq[String])],
      idCol: String = "doc_id", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "scoreBm25IndexBatch needs at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_no in the probe batch")
    queries.foreach { case (qno, terms) =>
      require(terms.nonEmpty, s"query $qno needs at least one term")
      require(terms.distinct.size == terms.size,
        s"query $qno terms must be distinct, got duplicates: " +
          terms.diff(terms.distinct).distinct.mkString(", "))
    }
    import spark.implicits._
    val nSlots = queries.map(_._2.size).max
    val qdf = queries
      .flatMap { case (qno, ts) =>
        ts.zipWithIndex.map { case (t, i) => (qno, t, i) } }
      .toDF("query_no", "term", "_slot")
    val allTerms = queries.flatMap(_._2).distinct
    val postings = spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(allTerms: _*))
    val dfs = spark.read.parquet(s"$indexDir/dfs")
      .where(col("term").isin(allTerms: _*))
    val stats = spark.read.parquet(s"$indexDir/stats")
    val idf = (col("n").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val perSlot = (0 until nSlots).map(i =>
      max(when(col("_slot") === i, col("bm25"))).as(s"_b$i"))
    postings
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        ((idf * (col("tf").cast("double") * lit(k1 + 1))) / denom).as("bm25"))
      .join(broadcast(qdf), "term")
      .groupBy(col("query_no"), col(idCol))
      .agg(perSlot.head, perSlot.tail: _*)
      .select(col("query_no"), col(idCol),
        (0 until nSlots).map(i => coalesce(col(s"_b$i"), lit(0.0)))
          .reduce(_ + _).as("score"))
  }

  /** Inverted index: per term, document frequency and the posting list of
    * the first `maxPostings` doc ids (ascending, comma-joined). Postings at
    * real scale are stored columnar per term-shard; the bounded CSV form
    * here is the portably-comparable surface.
    */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      maxPostings: Int = 10): DataFrame =
    // (term, doc) distinctness is free off the row-local term table —
    // the only exchange left is the term-keyed aggregate itself.
    termStream(docs, textCol, idCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(
          slice(transform(array_sort(collect_list(col(idCol))),
            x => x.cast("string")), 1, maxPostings), ",").as("postings"))

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009:
    * "Reciprocal rank fusion outperforms Condorcet and individual rank
    * learning methods"): fuse two rankings of the same id space by
    * score(id) = Σ_arms 1/(k0 + rank_arm(id)), ids absent from an arm
    * contributing 0 for it. The standard calibration-free way a training
    * -data pipeline marries a sparse (BM25) index to a dense (ANN) one —
    * no score normalization across arms, only INTEGER ranks enter the
    * fused score, so the result is bit-exact across engines by
    * construction.
    *
    * Inputs are the two top-k arm frames — (id, rk_lex) / (id, rk_sem)
    * with 1-based ranks — which are k rows each by construction (metadata
    * scale at any corpus size), so the full-outer fusion join is constant
    * cost; everything corpus-sized happened inside the arms.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k0: Int = 60): DataFrame = {
    def arm(rk: Column): Column =
      coalesce(lit(1.0) / (lit(k0.toDouble) + rk.cast("double")), lit(0.0))
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id"), col("rk_lex"), col("rk_sem"),
        (arm(col("rk_lex")) + arm(col("rk_sem"))).as("rrf"))
  }
}
