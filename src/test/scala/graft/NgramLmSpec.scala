package graft

import graft.operators.NgramLm

/** Hand-computed bigram-LM scores (xq48's oracle pins the corpus path). */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // train: bigrams (a,b)x2 (b,a)x2 (a,c)x1 -> c1: a=3 b=2; V={a,b,c}=3
  private val train = Seq((100L, "a b a b a c")).toDF("doc_id", "text")

  private def score(docs: Seq[(Long, String)]) =
    NgramLm.scoreDocs(train, docs.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("known bigram: P(b|a) = (2+1)/(3+3) = 1/2 -> ln 2 nats") {
    val out = score(Seq((1L, "a b")))
    assert(out.toSeq == Seq((1L, 1L, 693147L, 0.693147d)))
  }

  test("OOV context and OOV word both smooth to 1/V = 1/3") {
    // (z,q): c12=0, c1(z)=0 -> (0+1)/(0+3); (c,a): c never a context -> same
    val out = score(Seq((2L, "z q"), (3L, "a c a")))
    // doc 3: P(c|a) = (1+1)/(3+3) = 1/3, P(a|c) = 1/3 -> 2x 1098612
    assert(out.toSeq == Seq(
      (2L, 1L, 1098612L, 1.098612d),
      (3L, 2L, 2197224L, 1.098612d)))
  }

  test("single-token and empty docs produce no score rows") {
    assert(score(Seq((4L, "a"), (5L, ""))).isEmpty)
  }

  test("scores are stable under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = NgramLm.scoreDocs(docs, docs, "text", "doc_id")
    val b = NgramLm.scoreDocs(docs.repartition(11), docs.repartition(7), "text", "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("persisted-index probe is bit-identical to the strict recompute") {
    val docs = Tables.documents(spark, sf)
    val trainSplit = docs.where(org.apache.spark.sql.functions.col("source") === "src0")
    val batch = docs.where(org.apache.spark.sql.functions.col("source") === "src3")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-idx").toString
    NgramLm.writeLmIndex(trainSplit, "text", "doc_id", dir)
    val strict = NgramLm.scoreDocs(trainSplit, batch, "text", "doc_id")
    val probed = NgramLm.scoreLmIndex(spark, dir, batch, "text", "doc_id")
    assert(probed.count() > 0)
    assert(strict.exceptAll(probed).isEmpty && probed.exceptAll(strict).isEmpty,
      "index probe must reproduce the strict scores bit-exactly")
  }
}
