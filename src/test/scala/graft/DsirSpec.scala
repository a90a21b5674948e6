package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance weights: directional behavior on a planted corpus,
  * smoothing, and repartition determinism (xq70 covers the bulk path
  * against the oracle).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target speaks "alpha"; raw mixes alpha-docs and beta-docs.
  private def corpus = Seq(
    (1L, "alpha alpha alpha alpha"),
    (2L, "beta beta beta beta"),
    (3L, "alpha alpha beta beta"),
    (4L, "gamma gamma gamma gamma")
  ).toDF("id", "text")
  private def target = Seq((10L, "alpha alpha alpha alpha alpha"))
    .toDF("id", "text")

  test("docs resembling the target outweigh docs that don't") {
    val w = Dsir.importanceWeights(corpus, target, "text", "id",
      nBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) > w(3L), "pure alpha beats mixed")
    assert(w(3L) > w(2L), "mixed beats pure beta")
    assert(w(1L) > w(2L) && w(1L) > w(4L))
  }

  test("selection takes the top slice in weight order, id tie-broken") {
    val sel = Dsir.select(corpus, target, "text", "id", take = 2,
      nBuckets = 256).select("id").as[Long].collect().toSeq
    assert(sel.head == 1L, s"top pick must be the pure-target doc, got $sel")
    assert(sel.size == 2)
  }

  test("weights are deterministic under repartition") {
    val a = Dsir.importanceWeights(corpus, target, "text", "id")
      .orderBy("id").collect().toSeq
    val b = Dsir.importanceWeights(corpus.repartition(7),
      target.repartition(3), "text", "id").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("bucket table is bounded by nBuckets and covers every raw bucket") {
    val docs = Tables.documents(spark, sf)
    val lw = Dsir.bucketWeights(docs,
      docs.where(col("source") === "src0"), "text", nBuckets = 128)
    assert(lw.count() <= 128)
    val scored = Dsir.importanceWeights(docs,
      docs.where(col("source") === "src0"), "text", "doc_id", nBuckets = 128)
    // every doc is scored: the left join can't drop tokens
    assert(scored.count() == docs.count())
  }
}
