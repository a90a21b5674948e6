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

  test("flipped dHash of a PNG equals the top-down dHash of its BMP twin") {
    // encodeBmp stores rows bottom-up, the PNG path top-down: the decoded
    // rasters are vertical mirrors, so the flipped-sampling hash of one
    // format IS the top-down hash of the other, bit for bit.
    val r = raw(42)
    val (h0, h1, f0, f1) = Multimodal.dHashBoth(Multimodal.encodeBmp(r))
    val (p0, p1, pf0, pf1) = Multimodal.dHashBoth(Multimodal.encodePng(r))
    assert((pf0, pf1) == (h0, h1))
    assert((f0, f1) == (p0, p1))
  }

  test("cross-format (BMP→PNG) re-encode is rejected by the persisted index") {
    val (ing, _) = mkIngest()
    assert(ing.ingestBatch(Seq((1L, bmp(1)), (2L, bmp(2)))
      .toDF("doc_id", "payload"), 0L) == 2)
    // PNG of the same source bytes: multi-row, so the decoded raster is
    // the vertical MIRROR of the admitted BMP's — exact hash and top-down
    // dHash both differ; only the orientation-aware probe catches it
    val n1 = ing.ingestBatch(
      Seq((10L, Multimodal.encodePng(raw(1))), (11L, bmp(3)))
        .toDF("doc_id", "payload"), 1L)
    assert(n1 == 1)
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L))
  }

  test("multi-row PNG↔BMP golden: pinned dHash values, both orientations") {
    // GOLDEN: the seed-42 image is 300 bytes — multiple rows in both codecs
    // (BMP 438 B / PNG 366 B encoded) — and these literal hashes lock the
    // full decode → resample → dHash chain in both formats. A codec or
    // sampling regression moves a value; the mirror relation alone would
    // not catch a change that shifts both formats identically.
    val r = raw(42)
    assert(Multimodal.dHashBoth(Multimodal.encodeBmp(r)) ==
      ((960037121L, 741127348L, 3031706668L, 16857401L)))
    assert(Multimodal.dHashBoth(Multimodal.encodePng(r)) ==
      ((3031706668L, 16857401L, 960037121L, 741127348L)))
  }

  test("reverse direction: PNG admitted first, BMP re-encode rejected") {
    // the r6 cross-format test only probed PNG against an admitted BMP;
    // a one-sided orientation probe would pass it and fail this one
    val (ing, _) = mkIngest()
    assert(ing.ingestBatch(
      Seq((1L, Multimodal.encodePng(raw(1))), (2L, Multimodal.encodePng(raw(2))))
        .toDF("doc_id", "payload"), 0L) == 2)
    val n1 = ing.ingestBatch(Seq((10L, bmp(1)), (11L, bmp(3)))
      .toDF("doc_id", "payload"), 1L)
    assert(n1 == 1)
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L))
  }

  test("within-batch cross-format twins collapse to the min id") {
    val (ing, _) = mkIngest()
    val n = ing.ingestBatch(
      Seq((5L, bmp(7)), (6L, Multimodal.encodePng(raw(7))), (7L, bmp(8)))
        .toDF("doc_id", "payload"), 0L)
    assert(n == 2)
    val ids = ing.corpus().get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(5L, 7L))
  }

  test("ingestBatch releases the registry caches it creates") {
    val (ing, _) = mkIngest()
    val before = graft.operators.CacheRegistry.trackedCount
    ing.ingestBatch(Seq((1L, bmp(1)), (2L, bmp(2)))
      .toDF("doc_id", "payload"), 0L)
    // second batch exercises the index-probe path too
    ing.ingestBatch(Seq((3L, bmp(3))).toDF("doc_id", "payload"), 1L)
    assert(graft.operators.CacheRegistry.trackedCount == before)
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
