package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

/** The amortized posting-index regime (xq99's operator surface): a persisted
  * `writeBm25Index` must reproduce the recompute-form `bm25` scores
  * bit-exactly, and the probe's fixed-order score sum must equal the
  * hand-built per-term addition in the declared term order.
  */
class RankingSpec extends SparkSpec {

  test("posting-index probe reproduces recomputed bm25 bit-exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-idx").toString
    Ranking.writeBm25Index(docs, "text", "doc_id", dir)

    val terms = Seq("join", "hash")
    // reference: the strict recompute form, summed in the same fixed order
    val ref = Ranking.bm25(docs, "text", "doc_id")
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("term") === "join", col("bm25"))).as("b0"),
        max(when(col("term") === "hash", col("bm25"))).as("b1"))
      .select(col("doc_id"),
        (coalesce(col("b0"), lit(0.0)) + coalesce(col("b1"), lit(0.0))).as("score"))
      .as[(Long, Double)].collect().toMap

    val probed = Ranking.scoreBm25Index(spark, dir, terms)
      .as[(Long, Double)].collect().toMap
    assert(probed.nonEmpty && probed == ref,
      "index probe must be bit-identical to the recompute form")
  }

  test("postings scan is pruned to the query terms (pushed filter)") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-idx2").toString
    Ranking.writeBm25Index(docs, "text", "doc_id", dir)
    val plan = Ranking.scoreBm25Index(spark, dir, Seq("scan", "filter"))
      .queryExecution.executedPlan.toString
    // the term IN (...) filter must reach the parquet scan, not sit above it
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected term pushdown into the postings scan:\n$plan")
    // duplicated query terms would silently double-count a term's
    // contribution — the term-set contract is enforced at entry
    intercept[IllegalArgumentException] {
      Ranking.scoreBm25Index(spark, dir, Seq("join", "join"))
    }
  }
}
