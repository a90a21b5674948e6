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

  test("append-delta refresh == full rebuild (tables, stats, and scores)") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, sf)
    val staged = java.nio.file.Files.createTempDirectory("graft-bm25-app").toString
    docs.where(pmod(col("doc_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(staged)
    val gen1 = java.nio.file.Files.createTempDirectory("graft-bm25-g1").toString
    Ranking.writeBm25Index(spark.read.parquet(staged), "text", "doc_id", gen1)
    val before = new java.io.File(staged).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).toSet
    docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .write.mode("append").parquet(staged)
    val newFiles = new java.io.File(staged).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).filterNot(before).toSeq
    assert(newFiles.nonEmpty)
    val gen2 = java.nio.file.Files.createTempDirectory("graft-bm25-g2").toString
    Ranking.appendBm25Index(spark,
      operators.IndexStore.AppendDelta(gen1, newFiles), gen2, "text", "doc_id")
    val full = java.nio.file.Files.createTempDirectory("graft-bm25-full").toString
    Ranking.writeBm25Index(spark.read.parquet(staged), "text", "doc_id", full)
    // generation 1's posting files must be carried verbatim (hard links)
    def names(p: String) = new java.io.File(p).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    val g1Names = names(s"$gen1/postings")
    val g2Names = names(s"$gen2/postings")
    assert(g1Names.subsetOf(g2Names) && g2Names.size > g1Names.size,
      "append must link prior posting files and add new ones")
    // merged tables bit-equal to the rebuild (dfs, stats), and the scores
    for (sub <- Seq("postings", "dfs", "stats")) {
      val a = spark.read.parquet(s"$gen2/$sub")
      val b = spark.read.parquet(s"$full/$sub")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$sub differs")
    }
    val sa = Ranking.scoreBm25Index(spark, gen2, Seq("scan", "filter"))
    val sb = Ranking.scoreBm25Index(spark, full, Seq("scan", "filter"))
    assert(sa.count() > 0)
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
      "probe after append must equal the full rebuild bit-exactly")
  }

  test("rrfFuse: hand-computed fusion, absent-arm zeros, id coverage") {
    import spark.implicits._
    // lexical arm ranks: ids 0,1,2 at 1,2,3; dense arm ranks: ids 1,3 at 1,2
    val lex = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("id", "rk_lex")
    val sem = Seq((1L, 1L), (3L, 2L)).toDF("id", "rk_sem")
    val got = Ranking.rrfFuse(lex, sem)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L),
      "full-outer fusion must keep ids from either arm")
    assert(got(0L) == 1.0 / 61)                 // lex-only
    assert(got(1L) == 1.0 / 62 + 1.0 / 61)      // both arms
    assert(got(2L) == 1.0 / 63)
    assert(got(3L) == 1.0 / 62)                 // sem-only
  }

  test("xq110 invariants: fused top-10 is rank-consistent on the corpus") {
    val rows = SparkEntry.queries("xq110_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 10)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
      "rrf must be non-increasing in output order")
    rows.foreach { r =>
      val rl = Option(r.getAs[java.lang.Long]("rk_lex")).map(_.toLong)
      val rs = Option(r.getAs[java.lang.Long]("rk_sem")).map(_.toLong)
      assert(rl.nonEmpty || rs.nonEmpty, "a fused row must come from an arm")
      (rl.toSeq ++ rs.toSeq).foreach(rk => assert(rk >= 1 && rk <= 50))
      val expected = rl.map(k => 1.0 / (60.0 + k)).getOrElse(0.0) +
        rs.map(k => 1.0 / (60.0 + k)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expected,
        s"rrf must be exactly the reciprocal-rank sum for $r")
    }
  }
}
