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
}
