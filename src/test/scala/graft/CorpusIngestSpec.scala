package graft

import graft.streaming.CorpusIngest
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming corpus ingestion: within-batch + cross-batch dedup against the
  * persisted band index, and idempotent micro-batch replay.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  // ~40-token docs: long enough for shingles/minhash bands to be meaningful.
  // Every token embeds the seed so distinct-seed docs share NO shingles
  // (cross-seed Jaccard = 0) — otherwise LSH false positives at ~0.25
  // similarity make admission of a "fresh" doc a coin flip.
  private def doc(seed: String): String =
    (1 to 8).flatMap(i => Seq(seed, s"$seed-tok$i", s"$seed-fill", s"$seed-x$i", seed)).mkString(" ")

  private def mkIngest() = {
    val dir = Files.createTempDirectory("graft-ingest").toString
    (new CorpusIngest(spark, s"$dir/corpus", s"$dir/index"), dir)
  }

  test("within-batch exact + near dup collapse; cross-batch near-dups rejected") {
    val (ing, _) = mkIngest()
    val a = doc("alpha"); val b = doc("beta")
    // batch 0: a, exact copy of a, and b
    val n0 = ing.ingestBatch(Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text"), 0L)
    assert(n0 == 2) // {1, 3}
    // batch 1: near-dup of a (one token changed), plus a genuinely new doc
    val aNear = a.replace("tok5", "tok5x")
    val c = doc("gamma")
    val n1 = ing.ingestBatch(Seq((10L, aNear), (11L, c)).toDF("doc_id", "text"), 1L)
    assert(n1 == 1) // only c survives the index check
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 11L))
  }

  test("replaying a micro-batch is idempotent (overwrite-by-batch partition)") {
    val (ing, _) = mkIngest()
    val df = Seq((1L, doc("alpha")), (2L, doc("beta"))).toDF("doc_id", "text")
    assert(ing.ingestBatch(df, 0L) == 2)
    // at-least-once replay of the same batch id: count unchanged, no dup rows.
    // (the rerun sees its OWN bands in the index; overwrite of batch=0 must win)
    ing.ingestBatch(df, 0L)
    assert(ing.corpus().get.count() == 2)
  }

  test("streaming end-to-end via foreachBatch") {
    val (ing, dir) = mkIngest()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, doc("alpha")), (2L, doc("beta")))
    val q1 = ing.start(mem.toDF.toDF("doc_id", "text"), s"$dir/ckpt")
    q1.awaitTermination()
    mem.addData((3L, doc("alpha")), (4L, doc("delta"))) // 3 = exact dup of 1
    val q2 = ing.start(mem.toDF.toDF("doc_id", "text"), s"$dir/ckpt")
    q2.awaitTermination()
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }
}
