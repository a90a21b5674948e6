package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature linear classifier inference — the fastText-style quality
  * gate of a curation pipeline (CCNet / Llama-recipe style: a small linear
  * model over hashed token n-grams decides keep vs drop). This implements
  * the INFERENCE side at corpus scale; weights arrive as a (bucket,
  * weight_m) table from whatever offline trainer produced them
  * ([[defaultWeights]] is a deterministic stand-in).
  *
  * Determinism discipline: features hash through the portable 60-bit md5
  * prefix (identical in any engine), weights are integer MILLI-units so
  * per-doc sums are order-free, and the final margin is one exact integer
  * ratio — the same posture as the LM scorer.
  *
  * Scale shape: feature explosion is a map; the weight table is fixed
  * cardinality (nBuckets rows) and explicitly broadcast — the scoring pass
  * is map-side only; the single shuffle is the per-doc aggregation.
  */
object QualityClassifier {

  /** Portable feature bucket: 60-bit md5 prefix mod nBuckets (native
    * [[graft.expressions.Md5Prefix60]] — same value, no hex/conv detour).
    */
  def bucketOf(c: Column, nBuckets: Int): Column =
    (graft.expressions.Md5Prefix60(c) % nBuckets).as("bucket")

  /** Deterministic stand-in weight table (bucket, w_m) — milli-weights in
    * [-999, 999] from a small affine hash of the bucket id.
    */
  def defaultWeights(spark: SparkSession, nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(col("id").as("bucket"),
      ((col("id") * 37L + 11L) % 1999L - 999L).as("w_m"))

  /** The fused unigram+bigram hash-bucket stream (idCol, bucket) — one
    * narrow projection via [[graft.expressions.ShingleHashes]] (n=1 hashes
    * ARE `Md5Prefix60(token)`, n=2 the bigram hashes), replacing the
    * union-of-explodes that built every feature string just to hash it
    * (round 4). Shared by [[hashedCounts]] and [[score]].
    */
  private def bucketStream(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int): DataFrame =
    Parallelize.ensure(docs, col(idCol)).select(col(idCol), explode(concat(
        graft.expressions.ShingleHashes(col(textCol), 1),
        graft.expressions.ShingleHashes(col(textCol), 2))).as("_h"))
      .select(col(idCol), (col("_h") % nBuckets).as("bucket"))

  /** The hashed unigram+bigram count features of a corpus:
    * (idCol, bucket, c). Shared by [[score]]-style inference and
    * [[trainLogistic]].
    */
  def hashedCounts(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int): DataFrame =
    bucketStream(docs, textCol, idCol, nBuckets)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** In-engine training of the quality classifier — full-batch logistic
    * regression by gradient descent over the hashed count features (the
    * CCNet recipe's TRAINER: label a target split positive, the crawl
    * negative, fit a linear gate).
    *
    * Two physical regimes (r18): up to [[DenseMaxBuckets]] buckets the loop
    * runs DENSE — one cached per-doc count-vector table, one 1-job
    * map+aggregate pass per iteration, weights held on the driver as
    * literals (see [[trainDense]]). Above the cap the sparse join-loop
    * below runs: per iteration two bucket/doc-keyed aggregations with the
    * weight vector broadcast each round. Both produce bit-identical
    * weights (differential-tested).
    *
    * Cross-engine determinism (the xq48 ln recipe applied to exp): weights
    * live in exact integer MICRO-units; the per-doc sigmoid error is
    * quantized to 1e-6 — floor((σ(margin) − y)·1e6 + 0.5) — BEFORE entering
    * the per-bucket integer gradient sum, so every aggregation is order-free
    * integer arithmetic and the engine-specific ULP of exp() is absorbed by
    * the quantization. The update is one shared IEEE expression:
    * w −= floor(lr · grad / nDocs + 0.5).
    *
    * The per-round weight frame's lineage is cut by collecting it to the
    * driver and re-creating a local frame: weight frames are nBuckets rows
    * (metadata scale — they broadcast every round anyway, so they fit the
    * driver by construction). This keeps the halved training time the
    * round-2 localCheckpoint cut delivered (5.3 s -> 2.4 s at sf0.1:
    * each round's weights feed TWO broadcast joins whose materialization
    * re-executed the whole nested chain) while leaking no checkpoint
    * blocks in long-lived sessions (round-2 ADVICE); the feature table's
    * cache is likewise released before returning.
    *
    * `labels` must carry (idCol, y ∈ {0,1}). Returns (bucket, w_u
    * micro-weights, weight) for all nBuckets buckets.
    */
  def trainLogistic(docs: DataFrame, textCol: String, idCol: String,
      labels: DataFrame, nBuckets: Int = 64, iters: Int = 3,
      lr: Double = 0.1): DataFrame = {
    require(iters >= 1 && nBuckets >= 1, s"bad iters=$iters nBuckets=$nBuckets")
    val spark = docs.sparkSession
    if (nBuckets <= DenseMaxBuckets) {
      // r18 dense path (guide §1.2 step 1 — fix the distributed algorithm):
      // the whole loop runs over ONE cached per-doc dense count-vector
      // table; per iteration the cluster does a single 1-job pass (map-side
      // margin/err + one nBuckets-slot global aggregate) instead of a
      // broadcast build plus two cached-corpus joins. Weights live on the
      // driver (nBuckets longs — they were collected per round anyway).
      val featVecs = featureVectors(docs, textCol, idCol, labels, nBuckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()
      val w = trainDense(featVecs, nBuckets, iters, lr, nDocs)
      val out = spark.createDataFrame(
        java.util.Arrays.asList(w.zipWithIndex.map { case (wu, b) =>
          org.apache.spark.sql.Row(b.toLong, wu) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("w_u",
            org.apache.spark.sql.types.LongType, nullable = false))))
        .select(col("bucket"), col("w_u"),
          (col("w_u").cast("double") / lit(1e6)).as("weight"))
      featVecs.unpersist()
      return out
    }
    trainLogisticSparse(docs, textCol, idCol, labels, nBuckets, iters, lr)
  }

  /** The sparse join-loop trainer — [[trainLogistic]]'s regime above
    * [[DenseMaxBuckets]] (exposed package-private so the differential spec
    * can pin dense == sparse bit-for-bit at any bucket count).
    */
  private[graft] def trainLogisticSparse(docs: DataFrame, textCol: String,
      idCol: String, labels: DataFrame, nBuckets: Int, iters: Int,
      lr: Double): DataFrame = {
    val spark = docs.sparkSession
    // r17 optimization (guide §2.4 — share one exchange): the feature table
    // is cached PARTITIONED BY doc id, the key of everything each GD
    // iteration does with it. hashedCounts' own aggregation leaves it
    // hash-partitioned by (id, bucket), which satisfies NO downstream
    // requirement, so every iteration used to pay two corpus-scale
    // exchanges (margins' groupBy(id) after the broadcast weight join, and
    // the feats side of the gradient join on id) — 2·iters exchanges of
    // the biggest table in the query. Partitioned by id at cache time:
    // the broadcast join preserves the partitioning, groupBy(id) and both
    // id-keyed joins reuse it, and the per-iteration plan's only exchange
    // left is the 64-row bucket-gradient aggregation. The label frame is
    // cached id-partitioned for the same reason (it used to be re-scanned
    // and re-shuffled every iteration). Results are unchanged by
    // construction — every aggregate here is an order-free integer sum
    // (the spec pins stability under repartitioning).
    val feats = hashedCounts(docs, textCol, idCol, nBuckets)
      .repartition(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labs = labels.select(col(idCol), col("y").cast("long").as("y"))
      .repartition(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    var w = spark.range(nBuckets)
      .select(col("id").as("bucket"), lit(0L).as("w_u"))
    for (_ <- 1 to iters) {
      val margins = feats.join(broadcast(w), "bucket")
        .groupBy(col(idCol))
        .agg(sum(col("c") * col("w_u")).as("margin_u"))
        .join(labs, idCol)
      val errs = margins.select(col(idCol),
        floor((lit(1.0) / (lit(1.0) +
          exp(-(col("margin_u").cast("double") / lit(1e6)))) -
          col("y").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("e"))
      val grads = feats.join(errs, idCol)
        .groupBy("bucket").agg(sum(col("c") * col("e")).as("grad"))
      val updated = w.join(grads, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w_u") - floor(lit(lr) *
            coalesce(col("grad"), lit(0L)).cast("double") / lit(nDocs.toDouble) +
            lit(0.5)).cast("long")).as("w_u"))
      // nBuckets-row collect: bounded by design (see scaladoc), replaces
      // the leak-prone per-round localCheckpoint.
      w = spark.createDataFrame(
        java.util.Arrays.asList(updated.collect(): _*), updated.schema)
    }
    val out = w.select(col("bucket"), col("w_u"),
      (col("w_u").cast("double") / lit(1e6)).as("weight"))
    feats.unpersist()
    labs.unpersist()
    out
  }

  /** Bucket-count cap for the dense training path: per-doc count vectors
    * are nBuckets longs wide and the per-iteration gradient aggregate has
    * nBuckets buffer slots, so density only pays while the vector is small
    * against the document itself (the fastText-style quality gates this
    * models use 2^6..2^9 hash buckets). Above the cap [[trainLogistic]]
    * falls back to the sparse join-loop, which scales in features, not
    * buckets.
    */
  val DenseMaxBuckets = 512

  /** Per-doc DENSE feature row: (idCol, c0..c{n-1}, y) — bucket counts as
    * one wide row per doc, labels attached once (LEFT join: unlabeled docs
    * keep y null and are excluded from gradient passes only). Built with a
    * SINGLE id-keyed exchange: the nBuckets conditional-count aggregate
    * partial-aggregates map-side, so the exchange carries one (id, vector)
    * row per (task, doc) instead of the sparse (id, bucket, c) stream plus
    * a second exchange for the pivot. Docs with no features (empty text)
    * have no bucket rows and are absent — the sparse path's inner-join
    * semantics exactly.
    */
  private def featureVectors(docs: DataFrame, textCol: String, idCol: String,
      labels: DataFrame, nBuckets: Int): DataFrame = {
    val counts = (0 until nBuckets).map(i =>
      sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"c$i"))
    bucketStream(docs, textCol, idCol, nBuckets)
      .groupBy(col(idCol))
      .agg(counts.head, counts.tail: _*)
      .join(labels.select(col(idCol), col("y").cast("long").as("y")),
        Seq(idCol), "left")
  }

  /** The GD loop over [[featureVectors]]: per iteration ONE job — margins
    * and quantized sigmoid errors are map-side column arithmetic (the
    * weight vector is embedded as literals), and the nBuckets gradient
    * sums collapse in a single global aggregate. Arithmetic is
    * expression-for-expression the sparse loop's: margins/gradients are
    * order-free integer sums (the dense zero terms add exactly nothing)
    * and the driver-side update runs the same IEEE sequence
    * lr·grad/nDocs + 0.5 the Spark expression evaluated, so the learned
    * weights are bit-identical (QualityClassifierSpec's differential test
    * pins this).
    */
  private def trainDense(featVecs: DataFrame, nBuckets: Int, iters: Int,
      lr: Double, nDocs: Long): Array[Long] = {
    val w = new Array[Long](nBuckets)
    for (_ <- 1 to iters) {
      val margin = (0 until nBuckets).map(i =>
        col(s"c$i") * lit(w(i))).reduce(_ + _)
      val e = floor((lit(1.0) / (lit(1.0) +
        exp(-(margin.cast("double") / lit(1e6)))) -
        col("y").cast("double")) * lit(1e6) + lit(0.5)).cast("long")
      val gradCols = (0 until nBuckets).map(i =>
        sum(col(s"c$i") * col("_e")).as(s"g$i"))
      val row = featVecs.where(col("y").isNotNull)
        .withColumn("_e", e)
        .agg(gradCols.head, gradCols.tail: _*)
        .collect()(0)
      for (i <- 0 until nBuckets) {
        val grad = if (row.isNullAt(i)) 0L else row.getLong(i)
        w(i) -= math.floor(lr * grad.toDouble / nDocs.toDouble + 0.5).toLong
      }
    }
    w
  }

  /** Fused train -> apply (xq81's shape): train exactly as
    * [[trainLogistic]], then score EVERY featured doc's margin with the
    * final weights off the SAME cached feature table — the apply pass the
    * sparse form paid a full corpus re-featurization plus a broadcast join
    * for. Returns (idCol, margin_u); margin_u is the identical order-free
    * integer sum Σ c·w_u. The feature cache is registry-tracked (the
    * returned frame still reads it; the session owner releases).
    */
  def trainLogisticMargins(docs: DataFrame, textCol: String, idCol: String,
      labels: DataFrame, nBuckets: Int = 64, iters: Int = 3,
      lr: Double = 0.1): DataFrame = {
    require(iters >= 1 && nBuckets >= 1, s"bad iters=$iters nBuckets=$nBuckets")
    if (nBuckets > DenseMaxBuckets) {
      // sparse fallback: weights via the join-loop, margins via the
      // hashed-count join — the pre-r18 xq81 shape.
      val w = trainLogistic(docs, textCol, idCol, labels, nBuckets, iters, lr)
      return hashedCounts(docs, textCol, idCol, nBuckets)
        .join(broadcast(w.select("bucket", "w_u")), "bucket")
        .groupBy(col(idCol))
        .agg(sum(col("c") * col("w_u")).as("margin_u"))
    }
    import graft.operators.CacheRegistry.Cacheable
    val featVecs = featureVectors(docs, textCol, idCol, labels, nBuckets)
      .trackedCache
    val nDocs = docs.count()
    val w = trainDense(featVecs, nBuckets, iters, lr, nDocs)
    val margin = (0 until nBuckets).map(i =>
      col(s"c$i") * lit(w(i))).reduce(_ + _)
    featVecs.select(col(idCol), margin.as("margin_u"))
  }

  /** Per-doc margin over unigram + bigram hashed features:
    * (doc, n_feats, margin_m = Σ w_m, score = margin_m/1000/n_feats,
    * label = keep iff score > 0). Empty docs have no features and are
    * absent; unseen buckets carry weight 0 via the left join.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      weights: DataFrame, nBuckets: Int): DataFrame = {
    bucketStream(docs, textCol, idCol, nBuckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .select(col(idCol), coalesce(col("w_m"), lit(0L)).as("w_m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_m")).as("margin_m"))
      .select(col(idCol), col("n_feats"), col("margin_m"),
        (col("margin_m").cast("double") / lit(1000.0) / col("n_feats").cast("double"))
          .as("score"),
        when(col("margin_m") > 0L, lit("keep")).otherwise(lit("drop")).as("label"))
  }
}
