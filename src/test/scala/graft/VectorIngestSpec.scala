package graft

import graft.streaming.VectorIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming embedding ingest with semantic dedup-at-admission (r17) —
  * the vector twin of CorpusIngest/MediaIngest: within-batch rejection,
  * cross-batch rejection against the cell-pruned persisted store, frozen
  * quantizer, idempotent replay, and the cluster-partitioned layout.
  */
class VectorIngestSpec extends SparkSpec {
  import spark.implicits._

  // 16-dim scaled one-hot vectors: pairwise cosine between distinct
  // directions is ~0, a copy is exactly 1.0 — unambiguous vs threshold
  private def vec(dir: Int, boost: Double = 10.0): Seq[Double] =
    Seq.tabulate(16)(j => if (j == dir % 16) boost else 0.01 * ((dir + j) % 3))

  private def frame(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")

  private def fresh() = {
    val base = Files.createTempDirectory("graft-vec-ingest").toString
    (new VectorIngest(spark, s"$base/store", s"$base/centroids"), base)
  }

  private val batch1 = frame(
    (0L to 10L).map(i => i -> vec(i.toInt)) :+ (11L -> vec(5)))
  // fresh directions 12-15 plus verbatim copies of ids 3 and 7
  private val batch2 = frame(
    Seq(100L -> vec(12), 101L -> vec(13), 102L -> vec(14), 103L -> vec(15),
      200L -> vec(3), 201L -> vec(7)))

  test("within-batch and cross-batch near-dups are rejected at admission") {
    val (ing, _) = fresh()
    // id 11 duplicates id 5's vector -> smaller id survives
    assert(ing.ingestBatch(batch1, 0L) == 11L)
    // copies of stored 3 and 7 rejected via the cell-pruned store probe;
    // the four fresh directions admit
    assert(ing.ingestBatch(batch2, 1L) == 4L)
    val ids = ing.admitted().get.select("id").as[Long].collect().toSet
    assert(ids == (0L to 10L).toSet ++ Set(100L, 101L, 102L, 103L))
  }

  test("replayed micro-batch rewrites its own partition (idempotent)") {
    val (ing, _) = fresh()
    ing.ingestBatch(batch1, 0L)
    ing.ingestBatch(batch2, 1L)
    val before = ing.admitted().get.orderBy("id")
      .collect().map(_.toString).toSeq
    // at-least-once replay of batch 1
    ing.ingestBatch(batch2, 1L)
    val after = ing.admitted().get.orderBy("id")
      .collect().map(_.toString).toSeq
    assert(after == before, "replay must not duplicate or drop rows")
  }

  test("replay after a PARTIALLY visible batch write restores the full batch") {
    // the crash-in-job-commit window: some of batch 1's cluster dirs are
    // visible, the rest are not; the replayed batch must not self-reject
    // against its own partial partition and overwrite it with the
    // remainder (the silent-drop shape) — final store == clean run
    val (ing, base) = fresh()
    ing.ingestBatch(batch1, 0L)
    ing.ingestBatch(batch2, 1L)
    val clean = ing.admitted().get.select("id").as[Long].collect().toSet
    // tear: drop one cluster directory of batch=1 (partial visibility)
    val b1 = new java.io.File(s"$base/store/batch=1")
    val victim = b1.listFiles().filter(_.getName.startsWith("cluster=")).head
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      assert(f.delete())
    }
    wipe(victim)
    assert(ing.admitted().get.select("id").as[Long].collect().toSet != clean,
      "precondition: the tear must actually remove rows")
    ing.ingestBatch(batch2, 1L) // at-least-once replay
    assert(ing.admitted().get.select("id").as[Long].collect().toSet == clean,
      "replay must restore the full batch, not the remainder")
  }

  test("quantizer is frozen at first ingest; store is cell-partitioned") {
    val (ing, base) = fresh()
    ing.ingestBatch(batch1, 0L)
    val c1 = spark.read.parquet(s"$base/centroids")
      .orderBy("cluster").collect().map(_.toString).toSeq
    ing.ingestBatch(batch2, 1L)
    val c2 = spark.read.parquet(s"$base/centroids")
      .orderBy("cluster").collect().map(_.toString).toSeq
    assert(c2 == c1, "second batch must not retrain the quantizer")
    // layout: batch=<id>/cluster=<c> — the cluster partition column is
    // what makes the admission probe a pruned scan at corpus scale
    val b1 = new java.io.File(s"$base/store/batch=1")
    assert(b1.isDirectory &&
      b1.listFiles().exists(_.getName.startsWith("cluster=")),
      "store must be laid out by cell under each batch")
  }

  test("streaming end-to-end: MemoryStream batches drain through the ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (ing, _) = fresh()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = Files.createTempDirectory("graft-vec-ckpt").toString
    mem.addData((0L to 10L).map(i => i -> vec(i.toInt)) :+ (11L -> vec(5)): _*)
    val q1 = ing.start(mem.toDF.toDF("vec_id", "embedding"), ckpt)
    q1.awaitTermination()
    mem.addData(Seq(100L -> vec(12), 200L -> vec(3)): _*)
    val q2 = ing.start(mem.toDF.toDF("vec_id", "embedding"), ckpt)
    q2.awaitTermination()
    val ids = ing.admitted().get.select("id").as[Long].collect().toSet
    assert(ids == (0L to 10L).toSet + 100L)
  }
}
