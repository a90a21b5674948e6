package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths behind one API (SURVEY §7 risk (e)):
  *  - `bruteForceTopK`: exact cosine top-k — a broadcast of the query vector
  *    against a full scan; correct at any scale, O(N) per query.
  *  - `ivfTopK`: IVF-style approximate search — vectors are assigned to the
  *    nearest of a small deterministic centroid set (broadcast), and a query
  *    probes only its own cluster, cutting the scan by ~1/nCentroids. At
  *    100 TB the assignment is a narrow map stage (no shuffle: centroid set
  *    broadcast) and cluster ids become a partition column for pruning.
  */
object Similarity {

  /** Exact top-k neighbors of the vector with id `queryId`. */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        VectorFunctions.cosine(col(vecCol), col("q_vec")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic "trained" centroids: the first `nCentroids` vectors by id.
    * (Stand-in for a k-means fit; the plumbing — broadcast assign + pruned
    * probe — is the part that matters at scale.)
    */
  def centroids(emb: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int): DataFrame =
    emb.where(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("c_vec"))

  /** Lloyd's k-means over the embedding column — the trainer behind the IVF
    * index ([[centroids]] is the untrained stand-in). Deterministic
    * end-to-end:
    *   - init: the k smallest-id vectors (cluster labels ARE those ids);
    *   - assign: argmax cosine, smallest-label tie-break;
    *   - update: coordinate means with coordinates quantized to 1e-6 via
    *     floor(x*1e6 + 0.5) BEFORE summing — integer sums are order-free,
    *     so the fit is identical under any partitioning/parallelism and
    *     across engines (double-sum order is the classic nondeterminism
    *     trap in distributed k-means; quantization error 5e-7/coordinate is
    *     far below clustering-relevant signal).
    *
    * Per iteration: one broadcast of k centroids + a narrow argmax, then one
    * shuffle keyed by (cluster, dim) whose state is k*dims rows — nothing
    * scales with corpus size except the scan. Clusters that lose every
    * member drop out (standard Lloyd). Returns
    * (cluster, dim [1-based], centroid_val, n_members).
    */
  /** Argmax-cosine cluster over LITERAL centroids, as one narrow
    * projection: an array of (csim, -cluster, cluster) structs, one per
    * centroid, reduced by `array_max` (struct ordering = max csim,
    * smallest-cluster tie-break). Centroids are k·dims values — metadata
    * scale, so baking them into the plan as literals replaces the previous
    * crossJoin(broadcast) + groupBy-on-the-VECTOR argmax, which paid a k×
    * row blowup and an exchange that hashed every embedding array per
    * iteration (round 3; xq41 was 22x DuckDB with that shape).
    */
  private def literalArgmax(v: Column, cents: Seq[(Long, Seq[Double])]): Column =
    graft.expressions.BestCentroid.column(v, cents).getField("cluster")

  def kmeansFit(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters >= 1, s"need k > 0, iters >= 1; got k=$k iters=$iters")
    // Cast id/vector up front: the driver-side collects below read
    // getLong/getSeq[Double], which would ClassCastException on int ids.
    val e = emb.select(col(idCol).cast("long").as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    // Centroids live driver-side between iterations: k·dims doubles
    // (metadata scale — they were broadcast every round anyway). The
    // per-iteration collect is the same bounded class as the BPE argmax.
    var centLocal: Seq[(Long, Seq[Double])] = e.orderBy("_id").limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq
    // raw (cluster, dim, s, cnt) rows of the latest iteration — k·dims
    // bounded, the same driver-resident class as centLocal itself
    var lastSums: Array[(Long, Long, Long, Long)] = null
    for (_ <- 1 to iters) {
      val assigned = e.select(col("_id"), col("_v"),
        literalArgmax(col("_v"), centLocal).as("cluster"))
      lastSums = assigned
        .select(col("cluster"), posexplode(col("_v")).as(Seq("dim0", "x")))
        .groupBy(col("cluster"), (col("dim0") + 1).cast("long").as("dim"))
        .agg(sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // same IEEE tree as the previous in-plan expression:
      // CAST(s AS DOUBLE) / (1e6 * cnt) — Scala's Double*Long widening is
      // the identical multiply, so centroids are bit-unchanged
      centLocal = lastSums
        .groupBy(_._1)
        .map { case (c, rows) =>
          (c, rows.sortBy(_._2).map(r => r._3.toDouble / (1e6 * r._4))
            .toIndexedSeq: Seq[Double]) }
        .toIndexedSeq.sortBy(_._1)
    }
    // Return the ALREADY-COLLECTED final sums as a local relation instead
    // of the lazy last-iteration plan: consumers (assignToCentroids'
    // collect, semDedup's centroid assembly, xq84's re-aggregation) were
    // re-executing the whole final iteration — scan, argmax, explode,
    // shuffle — once each. k·dims rows of metadata never need that.
    val spark = emb.sparkSession
    import spark.implicits._
    lastSums.toSeq
      .map { case (c, dim, s, cnt) => (c, dim, s.toDouble / (1e6 * cnt), cnt) }
      .toDF("cluster", "dim", "centroid_val", "n_members")
  }

  /** Assignment against an arbitrary trained centroid frame
    * (cluster, cvec: array<double>) — e.g. [[kmeansFit]] output reassembled.
    * The centroid frame is k rows (metadata scale) and becomes plan
    * literals, so assignment is ONE narrow codegen'd projection — no join,
    * no per-vector argmax exchange (round 3, same shape as kmeansFit).
    */
  def assignToCentroids(emb: DataFrame, vecCol: String, idCol: String,
      cents: DataFrame): DataFrame = {
    val centLocal = cents
      .select(col("cluster").cast("long"), col("cvec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
      .toIndexedSeq.sortBy(_._1)
    val best = graft.expressions.BestCentroid.column(col(vecCol), centLocal)
    emb.select(col(idCol), best.getField("cluster").as("cluster"),
      best.getField("csim").as("csim"))
  }

  /** Cluster assignment: argmax-cosine centroid per vector, MAP-ONLY via
    * the [[graft.expressions.BestCentroid]] native expression (centroid
    * set bounded k·dims, collected once — KBs at any corpus size).
    *
    * Two prior forms both failed at scale (r15, measured on xq14 at sf5):
    * the crossJoin + groupBy(id, vec) + max_by shape paid a full-width
    * exchange of the corpus just to reduce 8 broadcast rows per vector;
    * the composed array_max-over-cosine-structs replacement was map-only
    * but plan-hostile — a downstream join's isnotnull(cluster) constraint
    * got rewritten through the projection, duplicating the whole argmax
    * tree into a Filter and knocking the stage out of whole-stage codegen
    * (2.8 -> 40 s). One native expression node keeps the plan small under
    * constraint copies and the loop codegen'd. Double arithmetic matches
    * the oracles' CAST(... AS DOUBLE[]).
    */
  def assign(emb: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int): DataFrame = {
    val centLocal = centroids(emb, vecCol, idCol, nCentroids)
      .select(col("cid").cast("long"), col("c_vec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
      .toIndexedSeq.sortBy(_._1)
    val best = graft.expressions.BestCentroid.column(col(vecCol), centLocal)
    emb.select(col(idCol), col(vecCol),
      best.getField("cluster").as("cluster"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then search for semantic duplicates ONLY within each
    * cluster — the cluster partitioning turns the O(N²) all-pairs search
    * into k independent O((N/k)²) searches. k grows with corpus size, so
    * per-cluster work stays bounded and the within-cluster self-join is an
    * ordinary shuffle keyed by cluster id (no product over the corpus).
    * Pairs with cosine >= threshold are semantic duplicates; the smallest
    * id of each pair survives (deterministic stand-in for the paper's
    * keep-farthest-from-centroid rule).
    *
    * Returns the REMOVED rows: (id, cluster, dup_of = smallest flagging
    * survivor-candidate, n_dups = flagging pairs, max_sim).
    *
    * `k = 0` (the DEFAULT) derives the scale-right cluster count via
    * [[semDedupK]] — k ∝ N, so per-cluster pair work stays constant as the
    * corpus grows (the contract this scaladoc promises; measured 2.2×
    * faster than a mis-sized fixed k at sf1). Pass an explicit k only to
    * pin a configuration — e.g. xq47 pins k=8 so its DuckDB oracle's
    * unrolled Lloyd CTEs stay comparable.
    */
  def semDedup(emb: DataFrame, vecCol: String, idCol: String, k: Int = 0,
      iters: Int = 2, threshold: Double = 0.95d): DataFrame = {
    val kk = if (k > 0) k else semDedupK(emb)
    val cents = kmeansFit(emb, vecCol, idCol, kk, iters)
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid_val")))),
        x => x.getField("centroid_val")).as("cvec"))
    val assigned = assignToCentroids(emb, vecCol, idCol, cents)
      .select(col(idCol), col("cluster"))
    // Persisted: the assigned-vector frame feeds BOTH sides of the
    // in-cluster self-join — uncached, assignment (and the k-means it
    // embeds) executes twice (the xq44/xq24 repeated-consumer pattern).
    // The L2 norm is computed ONCE per vector here, not per pair: the
    // in-cluster search evaluates ~(N/k)²·k pair similarities and
    // cosine's sqrt(dot(a,a))·sqrt(dot(b,b)) denominator was 2/3 of its
    // flops (sf1 stage probe: the pair stage is ~80% of the query).
    // sqrt-once-then-multiply is the same IEEE op sequence, so the oracle
    // is unchanged.
    val v = emb.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .join(assigned, Seq(idCol))
      .withColumn("_nrm", sqrt(VectorFunctions.dot(col("_v"), col("_v"))))
      .trackedCache
    v.select(col("cluster"), col(idCol).as("_ida"), col("_v").as("_va"),
        col("_nrm").as("_na"))
      .join(v.select(col("cluster"), col(idCol).as("_idb"),
        col("_v").as("_vb"), col("_nrm").as("_nb")), Seq("cluster"))
      .where(col("_ida") < col("_idb"))
      .select(col("cluster"), col("_ida"), col("_idb"),
        (VectorFunctions.dot(col("_va"), col("_vb")) /
          (col("_na") * col("_nb"))).as("_sim"))
      .where(col("_sim") >= threshold)
      .groupBy(col("_idb").as(idCol), col("cluster"))
      .agg(min(col("_ida")).as("dup_of"), count(lit(1)).as("n_dups"),
        max(col("_sim")).as("max_sim"))
  }

  /** Hard-negative mining — the retrieval-training data prep (DPR/contrastive
    * recipe): for each anchor, the most-similar vectors with a DIFFERENT
    * label are the "hard negatives" (near in embedding space, wrong by
    * label) that make contrastive training informative; random negatives
    * are too easy. Anchors = min id per label (deterministic). Anchors
    * broadcast (cardinality = #labels, fixed), one corpus scan computes
    * every anchor×candidate cosine, top-k per anchor via an anchor-keyed
    * window — the multi-query generalization of [[bruteForceTopK]]; swap
    * the scan for [[ivfTopK]]'s pruned probe when anchors grow.
    */
  def hardNegatives(emb: DataFrame, vecCol: String, idCol: String,
      labelCol: String, k: Int): DataFrame = {
    val anchors = emb.groupBy(col(labelCol).as("_albl"))
      .agg(min(col(idCol)).as("anchor_id"))
    val av = anchors.join(
      emb.select(col(idCol).as("anchor_id"), col(vecCol).as("_av")), "anchor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("sim").desc, col(idCol))
    emb.select(col(idCol), col(labelCol), col(vecCol))
      .join(broadcast(av), col(labelCol) =!= col("_albl"))
      .select(col("anchor_id"), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("_av")).as("sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** Target cluster population for the scale-right default (SCALING.md's
    * k ∝ N row): ~625 vectors per cluster keeps the per-cluster pair count
    * (~population²) constant as N grows — the value the sf1 stage probe
    * measured 2.2× faster than the oracle-pinned k=8 on the same data.
    */
  val SemDedupClusterSize: Long = 625L

  /** The scale-right k for a corpus: N / [[SemDedupClusterSize]], floored
    * at 8 so tiny corpora still partition. One count() — metadata next to
    * the Lloyd iterations that follow it.
    */
  def semDedupK(emb: DataFrame,
      clusterSize: Long = SemDedupClusterSize): Int =
    math.max(8, (emb.count() / clusterSize).toInt)

  /** The corpus [[semDedup]] keeps: everything not flagged as removed.
    * Same `k = 0` scale-right default as [[semDedup]].
    */
  def semDedupSurvivors(emb: DataFrame, vecCol: String, idCol: String,
      k: Int = 0, iters: Int = 2, threshold: Double = 0.95d): DataFrame =
    emb.join(semDedup(emb, vecCol, idCol, k, iters, threshold).select(idCol),
      Seq(idCol), "left_anti")

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR 1998):
    * greedily select `m` of the top-`window` cosine candidates for query
    * vector `queryId`, each pick maximizing
    * relWeight*sim(q,c) - divWeight*max_{s in selected} sim(c,s) —
    * relevance-vs-redundancy selection for training-data curation (the
    * anti-near-dup top-k). The weights are independent literals, NOT
    * (lambda, 1-lambda): 1.0-0.7 is 0.30000000000000004 in IEEE double,
    * the oracle's literal 0.3 is not — both engines must score with the
    * same bit patterns.
    *
    * Scale shape: the rerank WINDOW is bounded by construction (50-500 in
    * any production reranker — metadata scale at every corpus size), so
    * the greedy runs driver-side over the collected window exactly like
    * the k-means centroid state; everything corpus-sized — the scan,
    * cosine scoring, bounded top-k (TopKRows: map-side combine, k rows
    * per task on the wire) — stays in the engine. ONE corpus pass total:
    * the window is collected once, and its pairwise cosines are computed
    * back in the engine from a `window`-row LOCAL relation (broadcast
    * non-equi self-join, window² rows), so every double the greedy
    * compares is the engine's own matched-IEEE cosine, never a driver
    * recomputation.
    */
  def mmrRerank(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, window: Int = 50, m: Int = 10,
      relWeight: Double = 0.7, divWeight: Double = 0.3): DataFrame = {
    require(m >= 1 && window >= m, s"need 1 <= m <= window; got m=$m window=$window")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val qv = e.where(col("id") === queryId).select(col("v").as("qv"))
    val windowRows = e.where(col("id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("id"), col("v"),
        VectorFunctions.cosine(col("v"), col("qv")).as("simq"))
      .agg(graft.expressions.TopKRows(
        struct(col("simq"), col("id"), col("v")), window, Seq(true, false))
        .as("_top"))
      .select(posexplode(col("_top")))
      .select(col("col.id").as("id"), col("col.v").as("v"),
        col("col.simq").as("simq"))
      .collect() // the bounded window — the only driver-resident state
    // an absent query id (or an empty corpus) must fail HERE with the
    // contract named, not as minBy's UnsupportedOperationException on an
    // empty collection three stages later (r16 ADVICE)
    require(windowRows.nonEmpty,
      s"query vector $queryId not found or corpus empty")
    val cands = windowRows.map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toIndexedSeq
    val local = cands.toDF("id", "v", "simq")
    val pairSim = local.select(col("id").as("a"), col("v").as("va"))
      .join(broadcast(local.select(col("id").as("b"), col("v").as("vb"))),
        col("a") =!= col("b"))
      .select(col("a"), col("b"),
        VectorFunctions.cosine(col("va"), col("vb")).as("sim"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val simq = cands.map(c => c._1 -> c._3).toMap
    val first = cands.map(_._1).minBy(id => (-simq(id), id))
    var selected = Vector(first)
    while (selected.size < m && selected.size < cands.size) {
      val chosen = selected.toSet
      val next = cands.map(_._1).filterNot(chosen)
        .minBy { id =>
          val maxSim = selected.map(s => pairSim((id, s))).max
          (-(relWeight * simq(id) - divWeight * maxSim), id)
        }
      selected :+= next
    }
    selected.zipWithIndex
      .map { case (id, i) => (i + 1L, id) }.toDF("rk", "id")
  }

  /** Random-hyperplane LSH bucketing: plane p's side bit = sign of
    * dot(v, plane_p); bucket = the nPlanes-bit signature. The plane set is
    * deterministic — embeddings with id 1..nPlanes, which for this corpus
    * are i.i.d. gaussian vectors, i.e. genuine random hyperplanes. Probing
    * one bucket cuts the scan ~2^nPlanes-fold; at 100 TB the bucket id
    * becomes a partition column (same design as the IVF cluster id).
    */
  def lshAssign(emb: DataFrame, vecCol: String, idCol: String,
      nPlanes: Int): DataFrame = {
    // one signature aggregation, shared with the persisted index
    // ([[lshBuckets]]) — the inline query and xq114's index MUST stay
    // bit-identical, so there is exactly one copy of the shape
    val planes = emb.where(col(idCol) >= 1 && col(idCol) <= nPlanes)
      .select(col(idCol).as("pid"), col(vecCol).as("p_vec"))
    emb.select(col(idCol), col(vecCol),
        sqrt(VectorFunctions.dot(col(vecCol), col(vecCol))).as("norm"))
      .join(lshBuckets(emb, vecCol, idCol, planes), idCol)
  }

  /** Signature buckets for `df` against an explicit (pid, p_vec) plane
    * frame — the [[lshAssign]] shape with the plane set as an argument,
    * shared by the persisted-index build/probe (the planes must be the
    * STORED generation's, never recomputed from a grown corpus).
    */
  private def lshBuckets(df: DataFrame, vecCol: String, idCol: String,
      planes: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(planes))
      .groupBy(col(idCol))
      .agg(sum(
        when(VectorFunctions.dot(col(vecCol), col("p_vec")) > 0d,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pid AS INT) - 1)"))
          .otherwise(0L)).as("bucket"))

  /** Persisted sign-LSH index — the amortized posture for [[lshTopK]]
    * (the sixth persisted family: band/LM/BM25/PQ/IVF/+LSH). Layout under
    * `dir` ([[IndexStore]] lifecycle, commit marker `stats/_SUCCESS`):
    *  - `planes/` (pid, p_vec) — the plane set FROZEN at build (the
    *    corpus vectors with id in [1, nPlanes] of the BUILD generation);
    *  - `vectors/bucket=<b>/` (id, v, norm) — the corpus laid out by
    *    bucket: the signature is a PARTITION COLUMN, so a probe prunes
    *    ~2^nPlanes-fold (the IVF cell design with hyperplane cells);
    *  - `stats/` (n_planes) — 1 row, written LAST.
    */
  def writeLshIndex(emb: DataFrame, vecCol: String, idCol: String,
      dir: String, nPlanes: Int = 6): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.where(col(idCol) >= 1 && col(idCol) <= nPlanes)
      .select(col(idCol).cast("long").as("pid"), col(vecCol).cast("array<double>").as("p_vec"))
      .write.mode("overwrite").parquet(dir + "/planes")
    lshRows(emb, vecCol, idCol, spark.read.parquet(dir + "/planes"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir + "/vectors")
    Seq(Tuple1(nPlanes)).toDF("n_planes")
      .write.mode("overwrite").parquet(dir + "/stats")
  }

  /** (id, v, norm, bucket) rows for the partitioned vector store. */
  private def lshRows(emb: DataFrame, vecCol: String, idCol: String,
      planes: DataFrame): DataFrame =
    lshBuckets(emb, vecCol, idCol, planes)
      .select(col(idCol).cast("long").as("id"), col("bucket"))
      .join(emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v")), "id")
      .withColumn("norm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
      .select("id", "v", "norm", "bucket")

  /** Append-delta refresh of a [[writeLshIndex]] generation — the
    * frozen-quantizer regime with hyperplanes for the quantizer: the
    * plane set carries verbatim (it defines every stored bucket; probing
    * under new planes would unmap the corpus), prior bucket files
    * hard-link, only the appended vectors are signed + normed.
    */
  def appendLshIndex(spark: SparkSession, delta: IndexStore.AppendDelta,
      newDir: String, vecCol: String, idCol: String): Unit = {
    IndexStore.linkData(s"${delta.priorDir}/planes", s"$newDir/planes")
    IndexStore.linkData(s"${delta.priorDir}/vectors", s"$newDir/vectors")
    lshRows(spark.read.parquet(delta.newFiles: _*), vecCol, idCol,
      spark.read.parquet(delta.priorDir + "/planes"))
      .write.mode("append").partitionBy("bucket").parquet(newDir + "/vectors")
    spark.read.parquet(delta.priorDir + "/stats")
      .write.mode("overwrite").parquet(newDir + "/stats")
  }

  /** Cosine top-k for a BATCH of query vectors against a persisted LSH
    * index — single-probe ([[lshTopK]] semantics: only the query's own
    * bucket, so fewer than k rows is the documented recall tradeoff).
    * Query signatures are computed under the STORED planes; the vectors
    * scan statically prunes to the query buckets; scoring is
    * dot/(norm · q_norm) with ingest-time norms (the oracle-proven xq17
    * tree). Returns (query_id, rk, `idCol`, sim).
    */
  def probeLshIndex(spark: SparkSession, dir: String, queries: DataFrame,
      vecCol: String, idCol: String, kNN: Int): DataFrame = {
    import spark.implicits._
    // The query-side state is metadata (nPlanes plane vectors, a bounded
    // serving batch): signing it in the ENGINE cost a broadcast-join +
    // aggregate + collect job chain that dominated the probe at every SF
    // (~2 s flat, r17 bench — pure dispatch, zero compute). Driver-side
    // signing is the adcLut recipe: the strict left-to-right dot fold is
    // VectorDot's (so the >0 sign test compares the same double), the
    // bucket is an order-free integer bit sum, q_norm = Math.sqrt of the
    // same fold (Spark's sqrt) — bit-identical, jobs cut to the reads.
    val planes = spark.read.parquet(dir + "/planes").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val qs = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
    require(qs.map(_._1).distinct.length == qs.length,
      "duplicate query ids in the probe batch")
    // the engine sign test nulls out on a length mismatch (VectorDot) —
    // a silently truncated driver fold would route such a query to a
    // bucket the build could never assign; fail loudly instead
    qs.foreach { case (qid, v) =>
      planes.foreach { case (pid, pv) =>
        require(pv.length == v.length,
          s"query $qid has ${v.length} dims but plane $pid has " +
            s"${pv.length} — the index was built over a different width") } }
    val signed = qs.toSeq.map { case (qid, v) =>
      val bucket = planes.map { case (pid, pv) =>
        if (dot(v, pv) > 0d) 1L << (pid - 1).toInt else 0L }.sum
      (qid, bucket, v, math.sqrt(dot(v, v)))
    }
    val qb = signed.toDF("query_id", "bucket", "qv", "q_norm")
    val buckets = signed.map(_._2).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("id"))
    spark.read.parquet(dir + "/vectors")
      .where(col("bucket").isin(buckets.toIndexedSeq: _*)) // static pruning
      .join(broadcast(qb), "bucket")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        (VectorFunctions.dot(col("v"), col("qv")) / (col("norm") * col("q_norm")))
          .as("sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= kNN)
      .select(col("query_id"), col("rk"), col("id").as(idCol), col("sim"))
  }

  /** LSH top-k: probe only the query's bucket (may return fewer than k —
    * the recall/speed tradeoff of single-probe LSH).
    */
  def lshTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nPlanes: Int = 6): DataFrame = {
    val assigned = lshAssign(emb, vecCol, idCol, nPlanes)
    val q = assigned.where(col(idCol) === queryId)
      .select(col("bucket"), col(vecCol).as("q_vec"), col("norm").as("q_norm"))
    assigned.where(col(idCol) =!= queryId)
      .join(broadcast(q), "bucket")
      .select(col(idCol),
        (VectorFunctions.dot(col(vecCol), col("q_vec")) / (col("norm") * col("q_norm")))
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Multiprobe LSH top-k: probe the query's bucket plus every bucket at
    * hamming distance 1 (flip each plane bit) — the standard recall fix for
    * single-probe LSH at ~(nPlanes+1)x probe cost, still exponentially
    * cheaper than a full scan.
    */
  def lshTopKMultiprobe(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nPlanes: Int = 6): DataFrame = {
    val assigned = lshAssign(emb, vecCol, idCol, nPlanes)
    val probeBuckets = array(
      col("bucket") +: (0 until nPlanes).map(p =>
        expr(s"bucket ^ ${1L << p}")): _*)
    val q = assigned.where(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("norm").as("q_norm"),
        explode(probeBuckets).as("bucket"))
    assigned.where(col(idCol) =!= queryId)
      .join(broadcast(q), "bucket")
      .select(col(idCol),
        (VectorFunctions.dot(col(vecCol), col("q_vec")) / (col("norm") * col("q_norm")))
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Squared L2 distance spelled as (aa − 2ab) + bb so each term is a
    * sequential fold and the combination parses identically in SQL — the
    * parenthesization IS the cross-engine contract.
    */
  private def l2d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b)) +
      VectorFunctions.dot(b, b)

  /** L2 Lloyd's over a (_id, _v) frame — the product-quantization trainer
    * ([[kmeansFit]] is the cosine twin for IVF). Same determinism recipe:
    * smallest-id init, argmin distance with smallest-cluster tie-break,
    * 1e-6-quantized integer mean sums. Returns the FINAL (cluster, cvec)
    * centroids (rebuilt after the last assignment — encoding needs them).
    */
  def kmeansFitL2(vecs: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansFitL2Grouped(vecs.withColumn("sub", lit(0)), k, iters).drop("sub")

  /** GROUPED L2 Lloyd's: trains an independent k-centroid codebook for
    * every `sub` group of a (sub, _id, _v) frame in ONE plan chain —
    * assignments join on `sub` against one broadcast of ALL groups'
    * centroids, and centroid updates key their exact integer sums by
    * (sub, cluster, dim). Each group's math is identical to running
    * [[kmeansFitL2]] on it alone (all keys carry `sub`, so nothing mixes);
    * what changes is the JOB count: m subspace trainers × iters rounds
    * collapse from m independent chains (m broadcasts + m aggregates per
    * round — the measured job-count floor of the PQ path, xq57) to one.
    * Init per group: the k smallest `_id`s label their own clusters, same
    * as the single-group trainer.
    */
  def kmeansFitL2Grouped(subVecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 1, s"need k > 0, iters >= 1; got k=$k iters=$iters")
    val spark = subVecs.sparkSession
    val sv = subVecs.select(col("sub").cast("int").as("sub"),
      col("_id").cast("long").as("_id"),
      col("_v").cast("array<double>").as("_v"))
    // Init: the k smallest ids label their own clusters, per group — the
    // same rows the previous broadcast-join init selected, collected once
    // (m·k vectors of metadata, the kmeansFit centroid class).
    val initIds = sv.select(col("_id")).distinct().orderBy("_id").limit(k)
      .collect().map(_.getLong(0)).toSeq
    var centLocal: Map[Int, Seq[(Long, Seq[Double])]] = sv
      .where(col("_id").isin(initIds: _*))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1)
      .map { case (s, rows) =>
        (s, rows.map(r => (r._2, r._3: Seq[Double])).sortBy(_._1).toIndexedSeq: Seq[(Long, Seq[Double])]) }
    // Each round's assignment is ONE native BestCentroidL2 argmin node
    // carrying every group's centroids as literal state — map-only, no
    // broadcast join, and (the real win) no `groupBy(sub, _id, _v)`
    // hash aggregate KEYED BY THE VECTOR reducing the k× join fan-out.
    // (A per-sub literal-argmin CASE chain was tried and REJECTED: m·k
    // l2d2 literal EXPRESSION TREES defeated codegen and measured 10x
    // worse — one reference-object node is the shape that works, same
    // verdict as the cosine path's BestCentroid in r15.) The isNotNull
    // filter reproduces the former inner join's drop of a sub with no
    // centroid rows; d2 math and min_by tie-break are bit-identical.
    import spark.implicits._
    def centFrame: DataFrame = centLocal.toSeq.flatMap { case (s, cents) =>
      cents.map { case (c, v) => (s, c, v) } }
      .sortBy(t => (t._1, t._2))
      .toDF("sub", "cluster", "cvec")
    for (_ <- 1 to iters) {
      val sums = sv.select(col("sub"), col("_v"),
          graft.expressions.BestCentroidL2.column(col("sub"), col("_v"), centLocal)
            .as("_best"))
        .where(col("_best").isNotNull)
        .select(col("sub"), col("_best.cluster").as("cluster"),
          posexplode(col("_v")).as(Seq("dim0", "x")))
        .groupBy(col("sub"), col("cluster"), (col("dim0") + 1).cast("long").as("dim"))
        .agg(sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // same IEEE tree as the former in-plan CAST(s AS DOUBLE)/(1e6*cnt)
      centLocal = sums.groupBy(_._1).map { case (s, rows) =>
        (s, rows.groupBy(_._2).map { case (c, rs) =>
          (c, rs.sortBy(_._3).map(r => r._4.toDouble / (1e6 * r._5)).toIndexedSeq: Seq[Double])
        }.toIndexedSeq.sortBy(_._1): Seq[(Long, Seq[Double])]) }
    }
    // Local-relation return (the kmeansFit recipe): consumers broadcast
    // m·k rows without re-running any trainer iteration.
    centFrame
  }

  /** Product quantization (Jégou et al., "Product quantization for nearest
    * neighbor search"): the vector is split into `m` subspaces of `subDim`
    * dims; each subspace gets its own k-centroid L2 codebook; a vector is
    * stored as m small codes (m=4, k=16 ⇒ 2 bytes vs 256 — a 128x cut).
    * Search never touches raw vectors: a query builds an m×k distance
    * lookup table against the codebooks and each candidate's approximate
    * distance is the sum of m table entries (ADC).
    *
    * Scale shape: codebooks are m·k rows (broadcast everywhere); training
    * scans the corpus iters times with only (cluster,dim)-keyed
    * metadata-size shuffles; encoding/ADC shuffle narrow (id)-keyed rows.
    * Compose with [[ivfTopK]]'s cluster pruning for the classic IVF-PQ
    * index.
    *
    * Recall regime: on the i.i.d. gaussian test corpus exact-top-k recall is
    * low for ANY coded method (distance concentration — the same measured
    * finding as sign-LSH in COVERAGE.md); PqSpec asserts the property that
    * survives that regime (ADC ordering tracks true distances) and reports
    * recall honestly. On clustered real embeddings recall rises with m·log2 k
    * bits as usual.
    */
  def pqTrain(emb: DataFrame, vecCol: String, idCol: String,
      m: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    // ONE multi-subspace pass ([[kmeansFitL2Grouped]]): all m codebooks
    // train in a single plan chain instead of m independent trainers —
    // per-group math (and therefore the oracle) is unchanged, the m×
    // broadcast/aggregate job fan-out per Lloyd round is gone.
    val subs = emb.select(col(idCol).as("_id"),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim)): _*))
        .as(Seq("sub", "_v")))
    kmeansFitL2Grouped(subs, k, iters)
      .select(col("sub").cast("int").as("sub"), col("cluster"), col("cvec"))
  }

  /** (id, sub, code): each subvector's nearest codebook centroid.
    *
    * MAP-ONLY via [[graft.expressions.BestCentroidL2]]: the codebook is
    * m·k rows of metadata, collected once and baked into one native
    * argmin node — no k× explode-join row blowup, no vector-keyed
    * `groupBy(id, sub).min_by` exchange (the shape BestCentroid deleted
    * from the cosine path in r15; this was the last surviving instance —
    * xq57's 3.0×/3.7× sf5/sf10 residual, r16 VERDICT #1). Bit-identical
    * d2 fold and min_by(cluster, struct(d2, cluster)) tie-break; the
    * `isNotNull` filter reproduces the former inner join's row-drop for
    * a sub with no codebook rows.
    */
  def pqEncode(emb: DataFrame, vecCol: String, idCol: String,
      codebook: DataFrame, m: Int, subDim: Int): DataFrame = {
    val cbLocal = collectCodebook(codebook)
    val subs = emb.select(col(idCol), posexplode(array((0 until m).map(s =>
      slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim)): _*))
      .as(Seq("sub", "sv")))
    subs.select(col(idCol), col("sub"),
        graft.expressions.BestCentroidL2.column(col("sub"), col("sv"), cbLocal)
          .as("_best"))
      .where(col("_best").isNotNull)
      .select(col(idCol), col("sub"), col("_best.cluster").as("code"))
  }

  /** Driver-side (sub -> sorted (cluster, cvec)) view of a codebook frame
    * — m·k rows of metadata, the literal state [[pqEncode]] and the
    * grouped trainer hand to [[graft.expressions.BestCentroidL2]].
    */
  private def collectCodebook(codebook: DataFrame): Map[Int, Seq[(Long, Seq[Double])]] =
    codebook.select(col("sub").cast("int"), col("cluster").cast("long"),
        col("cvec").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1)
      .map { case (s, rows) =>
        (s, rows.map(r => (r._2, r._3: Seq[Double])).sortBy(_._1).toIndexedSeq: Seq[(Long, Seq[Double])]) }

  /** Driver-built (sub, code, d2) ADC lookup table for one query vector —
    * m·k rows of metadata. The Scala loop reproduces VectorDot's strict
    * left-to-right accumulation and [[l2d2]]'s (aa − 2ab) + bb tree, so the
    * d2 doubles are bit-identical to the former in-plan join's.
    */
  private def adcLut(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, cb: DataFrame, m: Int, subDim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Absent query id -> empty LUT -> empty top-k, matching the former
    // in-plan LUT's behavior (not a driver crash).
    val qRow = emb.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>"))
      .collect().headOption
    qRow match {
      case None => Seq.empty[(Int, Long, Double)].toDF("sub", "code", "d2")
      case Some(row) =>
        val cbLocal = cb.collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
        lutEntries(row.getSeq[Double](0).toIndexedSeq, cbLocal, subDim)
          .toDF("sub", "code", "d2")
    }
  }

  /** One query's m·k ADC LUT entries against a local codebook — the strict
    * left-to-right dot fold and (aa − 2ab) + bb tree shared by every LUT
    * builder (bit-identical to VectorDot / [[l2d2]]).
    */
  private def lutEntries(q: IndexedSeq[Double],
      cbLocal: Array[(Int, Long, IndexedSeq[Double])],
      subDim: Int): Seq[(Int, Long, Double)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    cbLocal.toSeq.map { case (sub, code, cvec) =>
      val qv = q.slice(sub * subDim, sub * subDim + subDim)
      (sub, code, (dot(qv, qv) - 2.0d * dot(qv, cvec)) + dot(cvec, cvec))
    }
  }

  /** PQ ADC top-k: approximate squared L2 = Σ over subspaces of the query's
    * precomputed distance to the candidate's code centroid. Per-entry
    * distances are 1e-9-quantized before the sum so the m-term addition is
    * order-free (the repo's integer-sum discipline).
    */
  def pqTopK(emb: DataFrame, vecCol: String, idCol: String, queryId: Long,
      kNN: Int, m: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    // cb is a LOCAL relation (kmeansFitL2Grouped collects its k·dims state
    // driver-side) — nothing upstream to cache.
    val cb = pqTrain(emb, vecCol, idCol, m, subDim, k, iters)
    val codes = pqEncode(emb, vecCol, idCol, cb, m, subDim)
    // The m×k ADC lookup table is metadata: one collect of the query vector
    // and a driver-side l2d2 loop (same strict left-to-right fold as
    // VectorDot, same (aa − 2ab) + bb parenthesization — bit-identical)
    // replace the query-scan join jobs the old lazy LUT paid per consumer.
    val lut = adcLut(emb, vecCol, idCol, queryId, cb, m, subDim)
    codes.join(broadcast(lut), Seq("sub", "code"))
      .select(col(idCol), floor(col("d2") * lit(1e9) + lit(0.5)).cast("long").as("dq"))
      .groupBy(idCol)
      .agg(sum(col("dq")).as("dqs"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), (col("dqs").cast("double") / lit(1e9)).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col(idCol))
      .limit(kNN)
  }

  /** IVF-PQ — the composed billion-scale index (FAISS's IVFx,PQy): coarse
    * k-means cells prune the candidate set to the query's cell ([[assign]]),
    * then PQ codes rank the survivors by ADC sum — the scan touches only
    * ~N/nCells code rows (2 bytes each), never a raw vector. Both stages
    * are the independently oracle-proven operators (xq41/xq14, xq57); this
    * wires them: cell assignment and codes are computed once (at ingest, at
    * scale), the query probes its cell's codes against its LUT.
    */
  def ivfPqTopK(emb: DataFrame, vecCol: String, idCol: String, queryId: Long,
      kNN: Int, nCells: Int, m: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    val cells = assign(emb, vecCol, idCol, nCells)
      .select(col(idCol), col("cluster").as("cell"))
    val cb = pqTrain(emb, vecCol, idCol, m, subDim, k, iters)
    val codes = pqEncode(emb, vecCol, idCol, cb, m, subDim).join(cells, idCol)
    val qCell = cells.where(col(idCol) === queryId).select(col("cell"))
    val lut = adcLut(emb, vecCol, idCol, queryId, cb, m, subDim)
    codes.join(broadcast(qCell), "cell")
      .join(broadcast(lut), Seq("sub", "code"))
      .select(col(idCol), floor(col("d2") * lit(1e9) + lit(0.5)).cast("long").as("dq"))
      .groupBy(idCol)
      .agg(sum(col("dq")).as("dqs"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), (col("dqs").cast("double") / lit(1e9)).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col(idCol))
      .limit(kNN)
  }

  /** Persisted PQ index — the amortized build-once/probe-N posture for ANN
    * serving (the band/BM25/LM-index regime applied to [[pqTopK]]):
    * production ANN never retrains codebooks per query, it trains and
    * encodes ONCE at ingest and answers every query batch from the stored
    * codes. Layout under `dir` (manage the lifecycle with
    * [[IndexStore]], commit marker `stats/_SUCCESS`):
    *  - `codebook/` (sub, cluster, cvec) — m·k rows, broadcast at probe
    *  - `codes/`    (id, sub, code)      — N·m rows, the only per-corpus
    *    state a probe scans (2 small ints + an id per row; raw vectors are
    *    never read again)
    *  - `stats/`    (m, sub_dim, k, iters) — 1 row, written LAST so a
    *    crashed build is detected by the missing marker.
    */
  def writePqIndex(emb: DataFrame, vecCol: String, idCol: String, dir: String,
      m: Int = 4, subDim: Int = 16, k: Int = 16, iters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = pqTrain(emb, vecCol, idCol, m, subDim, k, iters)
    cb.write.mode("overwrite").parquet(dir + "/codebook")
    pqEncode(emb, vecCol, idCol, cb, m, subDim)
      .withColumnRenamed(idCol, "id")
      .write.mode("overwrite").parquet(dir + "/codes")
    Seq((m, subDim, k, iters)).toDF("m", "sub_dim", "k", "iters")
      .write.mode("overwrite").parquet(dir + "/stats")
  }

  /** Append-delta refresh of a [[writePqIndex]] generation
    * (`IndexStore.ensureIncremental` buildDelta half) — the
    * FROZEN-QUANTIZER regime: the codebook is carried verbatim (k-means
    * retraining is deliberately NOT additive; production vector stores
    * re-encode new data under the serving codebook and retrain on a
    * schedule, not per ingest batch), prior code files hard-link over,
    * and only the appended vectors are encoded — one broadcast-codebook
    * scan of the new batch, the indexed corpus never re-read. Probe
    * results are bit-identical to encoding the grown corpus under the
    * SAME codebook (xq108's oracle trains on generation A and codes every
    * row; SimilaritySpec pins codes and probe equality). stats/ is
    * written last (the generation's ready marker).
    */
  def appendPqIndex(spark: SparkSession, delta: IndexStore.AppendDelta,
      newDir: String, vecCol: String, idCol: String): Unit = {
    IndexStore.linkData(s"${delta.priorDir}/codebook", s"$newDir/codebook")
    IndexStore.linkData(s"${delta.priorDir}/codes", s"$newDir/codes")
    val st = spark.read.parquet(delta.priorDir + "/stats").collect()(0)
    pqEncode(spark.read.parquet(delta.newFiles: _*), vecCol, idCol,
      spark.read.parquet(delta.priorDir + "/codebook"),
      st.getAs[Int]("m"), st.getAs[Int]("sub_dim"))
      .withColumnRenamed(idCol, "id")
      .write.mode("append").parquet(newDir + "/codes")
    spark.read.parquet(delta.priorDir + "/stats")
      .write.mode("overwrite").parquet(newDir + "/stats")
  }

  /** ADC top-k for a BATCH of query vectors against a persisted PQ index —
    * scoring is bit-identical to [[pqTopK]]'s (same driver-built LUT fold,
    * same 1e-9 quantize-then-integer-sum). The query batch is
    * driver-bounded by contract (a serving batch, not a corpus): one
    * collect builds each query's m·k-row LUT, the union of LUTs broadcasts,
    * and the probe is a single codes-scan join + (query, id)-keyed integer
    * aggregate + per-query top-k window. A query id present in the corpus
    * is excluded from its own neighbors, matching pqTopK.
    *
    * Returns (query_id, rk, `idCol`, adc_dist2) ranked within each query.
    */
  def probePqIndex(spark: SparkSession, dir: String, queries: DataFrame,
      vecCol: String, idCol: String, kNN: Int): DataFrame = {
    import spark.implicits._
    val st = spark.read.parquet(dir + "/stats").collect()(0)
    val subDim = st.getAs[Int]("sub_dim")
    val cbLocal = spark.read.parquet(dir + "/codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
    val qs = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
    // a repeated id would duplicate its LUT rows and silently double every
    // ADC sum for that query — refuse rather than mis-rank
    require(qs.map(_._1).distinct.length == qs.length,
      "duplicate query ids in the probe batch")
    val lut = qs.toSeq.flatMap { case (qid, q) =>
      lutEntries(q, cbLocal, subDim).map { case (sub, code, d2) =>
        (qid, sub, code, d2)
      }
    }.toDF("query_id", "sub", "code", "d2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist2").asc, col(idCol))
    spark.read.parquet(dir + "/codes")
      .join(broadcast(lut), Seq("sub", "code"))
      .select(col("query_id"), col("id"),
        floor(col("d2") * lit(1e9) + lit(0.5)).cast("long").as("dq"))
      .groupBy("query_id", "id")
      .agg(sum(col("dq")).as("dqs"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as(idCol),
        (col("dqs").cast("double") / lit(1e9)).as("adc_dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= kNN)
      .select("query_id", "rk", idCol, "adc_dist2")
  }

  /** Persisted IVF-PQ index — the composed billion-scale serving layout
    * (FAISS IVFx,PQy as an owned artifact; [[ivfPqTopK]] is the strict
    * inline twin). Layout under `dir` ([[IndexStore]] lifecycle, commit
    * marker `stats/_SUCCESS`):
    *  - `cells/` (cluster, cvec) — the coarse quantizer: the
    *    first-nCells deterministic centroids (the [[assign]]/xq14
    *    design), broadcast at probe;
    *  - `codebook/` (sub, cluster, cvec) — m·k PQ codebook rows;
    *  - `codes/cell=<c>/` (id, sub, code) — the ONLY per-corpus state a
    *    probe scans: 2 small ints + an id per row, laid out with the
    *    CELL AS PARTITION COLUMN, so a probe reads ~N·m/nCells code rows
    *    and never a raw vector;
    *  - `stats/` (n_cells, m, sub_dim, k, iters) — 1 row, written LAST.
    */
  def writeIvfPqIndex(emb: DataFrame, vecCol: String, idCol: String,
      dir: String, nCells: Int = 8, m: Int = 4, subDim: Int = 16,
      k: Int = 16, iters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    centroids(emb, vecCol, idCol, nCells)
      .select(col("cid").cast("long").as("cluster"),
        col("c_vec").cast("array<double>").as("cvec"))
      .write.mode("overwrite").parquet(dir + "/cells")
    val cb = pqTrain(emb, vecCol, idCol, m, subDim, k, iters)
    cb.write.mode("overwrite").parquet(dir + "/codebook")
    ivfPqCodeRows(emb, vecCol, idCol,
      spark.read.parquet(dir + "/cells"), cb, m, subDim)
      .write.mode("overwrite").partitionBy("cell").parquet(dir + "/codes")
    Seq((nCells, m, subDim, k, iters))
      .toDF("n_cells", "m", "sub_dim", "k", "iters")
      .write.mode("overwrite").parquet(dir + "/stats")
  }

  /** (id, sub, code, cell) rows: PQ codes + coarse-cell assignment, both
    * map-only (BestCentroidL2 / BestCentroid), one narrow id-keyed join.
    */
  private def ivfPqCodeRows(emb: DataFrame, vecCol: String, idCol: String,
      cells: DataFrame, cb: DataFrame, m: Int, subDim: Int): DataFrame =
    pqEncode(emb, vecCol, idCol, cb, m, subDim)
      .withColumnRenamed(idCol, "id")
      .join(assignToCentroids(emb, vecCol, idCol, cells)
        .select(col(idCol).cast("long").as("id"), col("cluster").as("cell")), "id")
      .select("id", "sub", "code", "cell")

  /** Append-delta refresh of a [[writeIvfPqIndex]] generation — BOTH
    * quantizers frozen (cells define the layout, the codebook defines
    * every stored code); prior code files hard-link, only the appended
    * vectors are encoded + cell-assigned.
    */
  def appendIvfPqIndex(spark: SparkSession, delta: IndexStore.AppendDelta,
      newDir: String, vecCol: String, idCol: String): Unit = {
    IndexStore.linkData(s"${delta.priorDir}/cells", s"$newDir/cells")
    IndexStore.linkData(s"${delta.priorDir}/codebook", s"$newDir/codebook")
    IndexStore.linkData(s"${delta.priorDir}/codes", s"$newDir/codes")
    val st = spark.read.parquet(delta.priorDir + "/stats").collect()(0)
    ivfPqCodeRows(spark.read.parquet(delta.newFiles: _*), vecCol, idCol,
      spark.read.parquet(delta.priorDir + "/cells"),
      spark.read.parquet(delta.priorDir + "/codebook"),
      st.getAs[Int]("m"), st.getAs[Int]("sub_dim"))
      .write.mode("append").partitionBy("cell").parquet(newDir + "/codes")
    spark.read.parquet(delta.priorDir + "/stats")
      .write.mode("overwrite").parquet(newDir + "/stats")
  }

  /** ADC top-k for a BATCH of query vectors against a persisted IVF-PQ
    * index: each query assigns to its cell (BestCentroid vs the stored
    * coarse centroids, map-only), its m·k LUT is driver-built from the
    * stored codebook (the [[probePqIndex]] fold — bit-identical ADC),
    * the codes scan statically prunes to the query cells, and the
    * (cell, sub, code) join scores ONLY same-cell candidates. Returns
    * (query_id, rk, `idCol`, adc_dist2).
    */
  def probeIvfPqIndex(spark: SparkSession, dir: String, queries: DataFrame,
      vecCol: String, idCol: String, kNN: Int): DataFrame = {
    import spark.implicits._
    val st = spark.read.parquet(dir + "/stats").collect()(0)
    val subDim = st.getAs[Int]("sub_dim")
    val cellsDf = spark.read.parquet(dir + "/cells")
    val qCells = assignToCentroids(queries, vecCol, idCol, cellsDf)
      .select(col(idCol).cast("long").as("query_id"), col("cluster").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(qCells.map(_._1).distinct.length == qCells.length,
      "duplicate query ids in the probe batch")
    val cellOf = qCells.toMap
    val cbLocal = spark.read.parquet(dir + "/codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
    val qs = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
    val lut = qs.toSeq.flatMap { case (qid, q) =>
      lutEntries(q, cbLocal, subDim).map { case (sub, code, d2) =>
        (qid, cellOf(qid), sub, code, d2)
      }
    }.toDF("query_id", "cell", "sub", "code", "d2")
    val cells = qCells.map(_._2).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist2").asc, col("id"))
    spark.read.parquet(dir + "/codes")
      .where(col("cell").isin(cells.toIndexedSeq: _*)) // static pruning
      .join(broadcast(lut), Seq("cell", "sub", "code"))
      .select(col("query_id"), col("id"),
        floor(col("d2") * lit(1e9) + lit(0.5)).cast("long").as("dq"))
      .groupBy("query_id", "id")
      .agg(sum(col("dq")).as("dqs"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        (col("dqs").cast("double") / lit(1e9)).as("adc_dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= kNN)
      .select(col("query_id"), col("rk"), col("id").as(idCol), col("adc_dist2"))
  }

  /** Scalar int8 quantization (the FAISS "SQ8" regime): each dimension is
    * affinely mapped to a byte via the corpus per-dim [min,max] range — a 4x
    * storage/scan-bandwidth cut (float32 → int8) that preserves ranking to
    * within half a quantization step per dim. "Training" is one narrow
    * posexplode + dims-row aggregate; the 2×dims stats arrays broadcast, so
    * encoding is map-only. Returns (mns, scs) as single-row arrays.
    *
    * Determinism: min/max are comparisons (order-free) and the affine map is
    * elementwise IEEE — no accumulation anywhere, so codes and decoded
    * vectors are identical across engines and partitionings.
    */
  def sq8Stats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim0", "x")))
      .groupBy("dim0")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("dim0"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("dim0"), col("mx")))),
          s => s.getField("mx")).as("mxs"))
      .select(col("mns"),
        zip_with(col("mxs"), col("mns"),
          (mx, mn) => when(mx > mn, (mx - mn) / lit(255.0)).otherwise(lit(1.0)))
          .as("scs"))

  /** Encode against [[sq8Stats]]: (id, codes: array<tinyint> storing
    * code−128, dv: the decoded vector mn + code·sc used by search). Search
    * over `dv` composes with [[ivfTopK]]/[[lshTopK]] bucketing — the
    * IVF-SQ8 index shape.
    */
  def sq8Encode(emb: DataFrame, vecCol: String, idCol: String): DataFrame = {
    def codeOf(x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val mn = element_at(col("mns"), i + 1)
      val sc = element_at(col("scs"), i + 1)
      least(greatest(floor((x - mn) / sc + lit(0.5)), lit(0.0)), lit(255.0))
    }
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .crossJoin(broadcast(sq8Stats(emb, vecCol)))
      .select(col(idCol),
        transform(col("_v"), (x, i) => (codeOf(x, i) - lit(128)).cast("byte"))
          .as("codes"),
        transform(col("_v"), (x, i) =>
          element_at(col("mns"), i + 1) + codeOf(x, i) * element_at(col("scs"), i + 1))
          .as("dv"))
  }

  /** SQ8 asymmetric-style top-k: rank by cosine over decoded vectors (ADC),
    * reporting the exact cosine alongside for error inspection.
    */
  def sq8TopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val enc = sq8Encode(emb, vecCol, idCol).select(col(idCol), col("dv"))
    val exact = emb.select(col(idCol), col(vecCol).cast("array<double>").as("_ev"))
    val both = enc.join(exact, idCol)
    val q = both.where(col(idCol) === queryId)
      .select(col("dv").as("q_dv"), col("_ev").as("q_ev"))
    both.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        VectorFunctions.cosine(col("dv"), col("q_dv")).as("adc_sim"),
        VectorFunctions.cosine(col("_ev"), col("q_ev")).as("exact_sim"))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(k)
  }

  /** Persisted IVF index — the amortized build-once/probe-N posture for
    * the coarse-quantizer family ([[writePqIndex]]'s sibling; r17
    * completes the persisted-index set: band xq105, LM xq106, BM25 xq107,
    * PQ xq108, IVF here). Layout under `dir` (lifecycle via [[IndexStore]],
    * commit marker `stats/_SUCCESS`):
    *  - `centroids/` (cluster, cvec) — k rows, the trained coarse
    *    quantizer ([[kmeansFit]], cosine), broadcast at probe;
    *  - `vectors/cluster=<c>/` (id, v, norm) — the corpus RE-LAID-OUT by
    *    cell: the cluster id is a PARTITION COLUMN, so a probe's scan is
    *    statically pruned to its query cells (the ScanPlanSpec-pinned
    *    100 TB design); norms are computed once at ingest, not per probe;
    *  - `stats/` (n_centroids, iters) — 1 row, written LAST.
    */
  def writeIvfIndex(emb: DataFrame, vecCol: String, idCol: String,
      dir: String, nCentroids: Int = 8, iters: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    kmeansFit(emb, vecCol, idCol, nCentroids, iters)
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid_val")))),
        x => x.getField("centroid_val")).as("cvec"))
      .write.mode("overwrite").parquet(dir + "/centroids")
    ivfRows(emb, vecCol, idCol, spark.read.parquet(dir + "/centroids"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dir + "/vectors")
    Seq((nCentroids, iters)).toDF("n_centroids", "iters")
      .write.mode("overwrite").parquet(dir + "/stats")
  }

  /** (id, v, norm, cluster) rows for the partitioned vector store — one
    * map-only pass: BestCentroid assignment + the ingest-time norm.
    */
  private def ivfRows(emb: DataFrame, vecCol: String, idCol: String,
      cents: DataFrame): DataFrame =
    assignToCentroids(emb, vecCol, idCol, cents)
      .select(col(idCol).cast("long").as("id"), col("cluster"))
      .join(emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v")), "id")
      .withColumn("norm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
      .select("id", "v", "norm", "cluster")

  /** Append-delta refresh of a [[writeIvfIndex]] generation — the same
    * FROZEN-QUANTIZER regime as [[appendPqIndex]]: centroids carry over
    * verbatim (coarse quantizers retrain on a schedule, never per ingest
    * batch), prior cell files hard-link, and only the appended vectors
    * are assigned + normed — one map-only scan of the new batch; the
    * indexed corpus is never re-read. Probe results are bit-identical to
    * indexing the grown corpus under the SAME centroids (xq113's oracle
    * trains on generation A and assigns every row). stats/ written last.
    */
  def appendIvfIndex(spark: SparkSession, delta: IndexStore.AppendDelta,
      newDir: String, vecCol: String, idCol: String): Unit = {
    IndexStore.linkData(s"${delta.priorDir}/centroids", s"$newDir/centroids")
    IndexStore.linkData(s"${delta.priorDir}/vectors", s"$newDir/vectors")
    ivfRows(spark.read.parquet(delta.newFiles: _*), vecCol, idCol,
      spark.read.parquet(delta.priorDir + "/centroids"))
      .write.mode("append").partitionBy("cluster").parquet(newDir + "/vectors")
    spark.read.parquet(delta.priorDir + "/stats")
      .write.mode("overwrite").parquet(newDir + "/stats")
  }

  /** Cosine top-k for a BATCH of query vectors against a persisted IVF
    * index. The query batch is driver-bounded by contract (a serving
    * batch): each query is assigned to its cell by the same BestCentroid
    * argmax the index used, the vectors scan is statically pruned to the
    * query cells via an `isin` on the PARTITION column (no full-corpus
    * read — the probe touches ~|queries|/k of the files), and scoring is
    * dot(v, qv)/(norm · q_norm) with the stored ingest-time norms — the
    * same IEEE tree as [[lshTopK]]'s (oracle-proven on xq17). A query id
    * present in the corpus is excluded from its own neighbors.
    *
    * Returns (query_id, rk, `idCol`, sim) ranked within each query.
    */
  def probeIvfIndex(spark: SparkSession, dir: String, queries: DataFrame,
      vecCol: String, idCol: String, kNN: Int): DataFrame = {
    val cents = spark.read.parquet(dir + "/centroids")
    val qb = assignToCentroids(queries, vecCol, idCol, cents)
      .select(col(idCol).cast("long").as("query_id"), col("cluster"))
      .join(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv")), "query_id")
      .withColumn("q_norm", sqrt(VectorFunctions.dot(col("qv"), col("qv"))))
    val qLocal = qb.select("query_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // a repeated id would duplicate candidate rows per query — refuse
    // rather than mis-rank (the probePqIndex guard)
    require(qLocal.map(_._1).distinct.length == qLocal.length,
      "duplicate query ids in the probe batch")
    val cells = qLocal.map(_._2).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("id"))
    spark.read.parquet(dir + "/vectors")
      .where(col("cluster").isin(cells.toIndexedSeq: _*)) // static pruning
      .join(broadcast(qb), "cluster")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        (VectorFunctions.dot(col("v"), col("qv")) / (col("norm") * col("q_norm")))
          .as("sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= kNN)
      .select(col("query_id"), col("rk"), col("id").as(idCol), col("sim"))
  }

  /** IVF top-k: probe only the query's cluster. Approximate — recall depends
    * on nCentroids/probes; exact within the probed cluster.
    */
  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nCentroids: Int): DataFrame = {
    val assigned = assign(emb, vecCol, idCol, nCentroids)
    val qRow = assigned.where(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("cluster"))
    assigned.where(col(idCol) =!= queryId)
      .join(broadcast(qRow), "cluster")
      .select(col(idCol),
        VectorFunctions.cosine(col(vecCol), col("q_vec")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
