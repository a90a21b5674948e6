package graft

import graft.operators.Multimodal
import graft.streaming.MediaIngest
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming media ingestion: perceptual (dHash) dedup within the batch and
  * against the persisted hash index, and idempotent micro-batch replay.
  * The headline property: a brightness-shifted RE-ENCODE of an admitted
  * image — different payload bytes, different exact hash — is rejected.
  */
class MediaIngestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic per-seed noise image (java.util.Random's LCG is
  // spec-fixed); bytes capped at 127 so a +8 brightness shift never clamps
  private def raw(seed: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    Array.fill(300)((r.nextInt(128)).toByte)
  }
  private def bmp(seed: Int): Array[Byte] = Multimodal.encodeBmp(raw(seed))
  private def shifted(seed: Int): Array[Byte] =
    Multimodal.encodeBmp(raw(seed).map(b => ((b & 0xFF) + 8).toByte))

  private def mkIngest() = {
    val dir = Files.createTempDirectory("graft-media").toString
    (new MediaIngest(spark, s"$dir/corpus", s"$dir/index"), dir)
  }

  test("brightness-shifted re-encode is rejected by the persisted index") {
    val (ing, _) = mkIngest()
    val n0 = ing.ingestBatch(Seq((1L, bmp(1)), (2L, bmp(2)))
      .toDF("doc_id", "payload"), 0L)
    assert(n0 == 2)
    // batch 1: a shifted re-encode of asset 1 (payload bytes differ — an
    // exact-hash index would admit it) plus a genuinely new image
    assert(!java.util.Arrays.equals(bmp(1), shifted(1)))
    val n1 = ing.ingestBatch(Seq((10L, shifted(1)), (11L, bmp(3)))
      .toDF("doc_id", "payload"), 1L)
    assert(n1 == 1)
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L))
  }

  test("within-batch perceptual dups collapse to the min id") {
    val (ing, _) = mkIngest()
    val n = ing.ingestBatch(
      Seq((5L, bmp(7)), (6L, shifted(7)), (7L, bmp(8)))
        .toDF("doc_id", "payload"), 0L)
    assert(n == 2)
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(5L, 7L))
  }

  test("replaying a micro-batch is idempotent") {
    val (ing, _) = mkIngest()
    val df = Seq((1L, bmp(1)), (2L, bmp(2))).toDF("doc_id", "payload")
    assert(ing.ingestBatch(df, 0L) == 2)
    ing.ingestBatch(df, 0L) // replay sees its own hashes; overwrite wins
    assert(ing.corpus().get.count() == 2)
  }

  test("streaming end-to-end via foreachBatch") {
    val (ing, dir) = mkIngest()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData((1L, bmp(1)), (2L, bmp(2)))
    val q1 = ing.start(mem.toDF.toDF("doc_id", "payload"), s"$dir/ckpt")
    q1.awaitTermination()
    mem.addData((3L, shifted(2)), (4L, bmp(4))) // 3 = perceptual dup of 2
    val q2 = ing.start(mem.toDF.toDF("doc_id", "payload"), s"$dir/ckpt")
    q2.awaitTermination()
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L))
  }
}
