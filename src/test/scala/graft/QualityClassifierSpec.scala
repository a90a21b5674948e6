package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Hashed linear classifier invariants (xq49's oracle pins corpus values). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha beta gamma"),
    (3L, "delta")).toDF("doc_id", "text")

  test("feature count is unigrams + bigrams = 2n - 1") {
    val w = QualityClassifier.defaultWeights(spark, 256)
    val out = QualityClassifier.score(docs, "text", "doc_id", w, 256)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 5L, 1L))
    // identical text -> identical margin (hashing is content-determined)
    assert(out(0).getLong(2) == out(1).getLong(2))
  }

  test("uniform positive weights give score 1.0/keep; negative give drop") {
    val allPos = spark.range(256).select(col("id").as("bucket"), lit(1000L).as("w_m"))
    val pos = QualityClassifier.score(docs, "text", "doc_id", allPos, 256)
      .select("score", "label").distinct().collect()
    assert(pos.map(r => (r.getDouble(0), r.getString(1))).toSet == Set((1.0d, "keep")))
    val allNeg = spark.range(256).select(col("id").as("bucket"), lit(-1L).as("w_m"))
    val neg = QualityClassifier.score(docs, "text", "doc_id", allNeg, 256)
      .select("label").distinct().collect()
    assert(neg.map(_.getString(0)).toSeq == Seq("drop"))
  }

  test("scores are stable under input repartitioning") {
    val corpus = Tables.documents(spark, sf)
    val w = QualityClassifier.defaultWeights(spark, 256)
    val a = QualityClassifier.score(corpus, "text", "doc_id", w, 256)
    val b = QualityClassifier.score(corpus.repartition(9), "text", "doc_id", w, 256)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("trainLogistic separates a separable corpus and is deterministic") {
    // Disjoint vocabularies: positives say only good-words, negatives only
    // bad-words -> every good-word bucket must go positive, bad negative.
    val corpus = ((1 to 10).map(i => (i.toLong, "good fine great", 1L)) ++
      (11 to 20).map(i => (i.toLong, "spam junk noise", 0L)))
      .toDF("doc_id", "text", "y")
    val labels = corpus.select(col("doc_id"), col("y"))
    val w = QualityClassifier.trainLogistic(corpus, "text", "doc_id",
      labels, nBuckets = 64, iters = 5, lr = 0.5)
    val wm = w.select("bucket", "w_u").as[(Long, Long)].collect().toMap
    def bucket(f: String): Long = corpus.sparkSession.range(1)
      .select(QualityClassifier.bucketOf(lit(f), 64)).head().getLong(0)
    Seq("good", "fine", "great", "good fine").foreach { f =>
      assert(wm(bucket(f)) > 0L, s"positive-class feature '$f' must gain weight")
    }
    Seq("spam", "junk", "noise", "spam junk").foreach { f =>
      assert(wm(bucket(f)) < 0L, s"negative-class feature '$f' must lose weight")
    }
    // Trained weights classify the training set perfectly via the margin.
    val feats = QualityClassifier.hashedCounts(corpus, "text", "doc_id", 64)
    val margins = feats.join(w, "bucket")
      .groupBy("doc_id").agg(sum(col("c") * col("w_u")).as("m"))
      .join(labels, "doc_id")
      .select(col("y"), (col("m") > 0L).as("pred")).collect()
    margins.foreach(r => assert((r.getLong(0) == 1L) == r.getBoolean(1)))
    // Deterministic under repartition.
    val again = QualityClassifier.trainLogistic(corpus.repartition(7), "text",
      "doc_id", labels, nBuckets = 64, iters = 5, lr = 0.5)
      .select("bucket", "w_u").as[(Long, Long)].collect().toMap
    assert(again == wm)
  }

  test("dense (<= DenseMaxBuckets) and sparse train paths are bit-identical") {
    // Mixed corpus incl. an empty doc (no features) and an unlabeled doc:
    // the dense path must reproduce the sparse loop's inner-join semantics
    // (featureless docs absent; unlabeled docs excluded from gradients
    // only) and its exact integer/IEEE arithmetic, weight for weight.
    val corpus = Tables.documents(spark, sf).limit(40)
    val labels = corpus
      .where(col("doc_id") =!= 3L) // doc 3 unlabeled
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, 1L).otherwise(0L).as("y"))
    val n = 96 // <= DenseMaxBuckets -> dense path
    assert(n <= QualityClassifier.DenseMaxBuckets)
    val dense = QualityClassifier.trainLogistic(corpus, "text", "doc_id",
      labels, nBuckets = n, iters = 3, lr = 0.25)
      .select("bucket", "w_u", "weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val sparse = QualityClassifier.trainLogisticSparse(corpus, "text",
      "doc_id", labels, nBuckets = n, iters = 3, lr = 0.25)
      .select("bucket", "w_u", "weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(dense == sparse)
    // The fused train->apply margins equal scoring hashedCounts with the
    // trained weights (xq81's pre-r18 shape), row for row.
    val wDf = QualityClassifier.trainLogistic(corpus, "text", "doc_id",
      labels, nBuckets = n, iters = 3, lr = 0.25)
    val viaJoin = QualityClassifier.hashedCounts(corpus, "text", "doc_id", n)
      .join(wDf.select("bucket", "w_u"), "bucket")
      .groupBy("doc_id").agg(sum(col("c") * col("w_u")).as("margin_u"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val fused = QualityClassifier.trainLogisticMargins(corpus, "text",
      "doc_id", labels, nBuckets = n, iters = 3, lr = 0.25)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fused == viaJoin)
  }
}
