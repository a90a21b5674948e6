package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("asset schema: binary payload + typed metadata") {
    val a = Multimodal.assets(Tables.documents(spark, sf))
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.schema("n_bytes").dataType.typeName == "long")
    val r = a.orderBy("doc_id").select("n_bytes").head().getLong(0)
    assert(r > 0)
  }

  test("feature extraction is deterministic under repartitioning") {
    val assets = Multimodal.imageAssets(Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(spark, assets)
      .toDF().orderBy("doc_id").collect().toSeq
    val f2 = Multimodal.extractFeatures(spark, assets.repartition(13))
      .toDF().orderBy("doc_id").collect().toSeq
    assert(f1.map(_.toString) == f2.map(_.toString))
  }

  test("BMP round trip: ImageIO decodes dimensions and channel sums exactly") {
    // Known pattern: bytes 0..199 → B,G,R interleaved, 96-byte rows →
    // 200 bytes = 3 rows of 32 px (zero-padded tail).
    val raw = Array.tabulate(200)(i => i.toByte)
    val bmp = Multimodal.encodeBmp(raw)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h, sb, sg, sr) = Multimodal.decodeImage(bmp)
    assert(w == Multimodal.BmpWidth && h == 3)
    def expect(ch: Int) = (0 until 200).filter(_ % 3 == ch).map(_.toLong).sum
    assert(sb == expect(0) && sg == expect(1) && sr == expect(2))
    // empty payload still yields a decodable 1-row image
    val (w0, h0, zb, zg, zr) = Multimodal.decodeImage(Multimodal.encodeBmp(Array.empty))
    assert(w0 == Multimodal.BmpWidth && h0 == 1 && zb + zg + zr == 0L)
  }

  test("PNG round trip: compressed payload decodes to the same features as BMP") {
    val raw = Array.tabulate(200)(i => i.toByte)
    val png = Multimodal.encodePng(raw)
    // PNG magic; compressed, so payload size differs from pixel bytes
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte)
    assert(png.length != 54 + 3 * 96, "compressed size must not equal BMP layout")
    val (w, h, sb, sg, sr) = Multimodal.decodeImage(png)
    val (bw, bh, bb, bg, br) = Multimodal.decodeImage(Multimodal.encodeBmp(raw))
    assert((w, h, sb, sg, sr) == ((bw, bh, bb, bg, br)))
    // empty payload
    val (w0, h0, zb, zg, zr) = Multimodal.decodeImage(Multimodal.encodePng(Array.empty))
    assert(w0 == Multimodal.BmpWidth && h0 == 1 && zb + zg + zr == 0L)
  }

  test("frame sampling slices the expected windows") {
    import spark.implicits._
    val assets = Seq((1L, ("x" * 300).getBytes("UTF-8"), "text/plain", 300L))
      .toDF("doc_id", "payload", "mime", "n_bytes")
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 2)
      .orderBy("frame_idx").collect()
    // 300 bytes / (32*2) = 4 frames, each 32 bytes from offsets 0,64,128,192
    assert(frames.length == 4)
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 32))
  }

  test("near-dedup keeps min-id survivor of dup groups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "entirely different words with no shingle overlap at all here")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.dropNearDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("approx_percentile within 5% of the exact percentile (rq28 vs rq26)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sketch = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(sketch(k) - ex) / ex < 0.05,
        s"group $k: sketch ${sketch(k)} vs exact $ex")
    }
  }

  test("approx_count_distinct within 15% of exact") {
    val e = Tables.events(spark, sf)
    val exact = e.agg(countDistinct("user_id")).head().getLong(0)
    val approx = e.agg(approx_count_distinct("user_id")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }
}
