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

  test("riff chunk walk: extra/odd-sized chunks skipped, wrong formats rejected") {
    // The r9 handwritten parser must behave like a real RIFF reader, not a
    // fixed-offset hack: an unknown odd-length LIST chunk spliced between
    // fmt and data (with its spec-mandated pad byte) must be walked over,
    // and non-PCM16-mono payloads must be rejected exactly as the
    // javax.sound path rejected them.
    val raw = Array.tabulate(10)(i => (i * 25).toByte)
    val wav = Multimodal.encodeWav(raw)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      "abc".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = wav.slice(0, 36) ++ junk ++ wav.slice(36, wav.length)
    assert(Multimodal.decodeAudio(spliced) == Multimodal.decodeAudio(wav),
      "unknown chunk must not change the decode")
    val stereo = wav.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Multimodal.decodeAudio(stereo))
    val wide = wav.clone(); wide(34) = 24
    intercept[IllegalArgumentException](Multimodal.decodeAudio(wide))
    val float32 = wav.clone(); float32(20) = 3
    intercept[IllegalArgumentException](Multimodal.decodeAudio(float32))
    intercept[IllegalArgumentException](
      Multimodal.decodeAudio("not a wav at all".getBytes("US-ASCII")))
    // malformed chunk sizes must raise, never stall the walk: a size with
    // the top bit set wraps negative in the Int cast (a crafted -8 would
    // otherwise advance the offset by zero and loop forever)
    val negLen = wav.clone()
    negLen(16) = 0xF8.toByte; negLen(17) = 0xFF.toByte
    negLen(18) = 0xFF.toByte; negLen(19) = 0xFF.toByte
    intercept[IllegalArgumentException](Multimodal.decodeAudio(negLen))
    // a huge-but-positive size must terminate (offset clamps to payload
    // end) and report the missing data chunk rather than wrap negative
    val hugeLen = wav.clone()
    hugeLen(16) = 0xF0.toByte; hugeLen(17) = 0xFF.toByte
    hugeLen(18) = 0xFF.toByte; hugeLen(19) = 0x7F.toByte
    intercept[IllegalArgumentException](Multimodal.decodeAudio(hugeLen))
  }

  test("WAV round trip: header-parsed rate, samples, and exact sums") {
    val raw = Array.tabulate(200)(i => i.toByte)
    val wav = Multimodal.encodeWav(raw)
    assert(new String(wav.slice(0, 4)) == "RIFF" && new String(wav.slice(8, 12)) == "WAVE")
    val (rate, n, sumAbs, energy, peak, silent) = Multimodal.decodeAudio(wav)
    assert(rate == Multimodal.SampleRate && n == 200)
    val samples = raw.map(b => ((b & 0xFF) - 128) * 256)
    assert(sumAbs == samples.map(s => math.abs(s).toLong).sum)
    assert(energy == samples.map(s => math.abs(s).toLong * math.abs(s)).sum)
    assert(peak == samples.map(s => math.abs(s).toLong).max)
    assert(silent == samples.count(s => math.abs(s) < Multimodal.SilenceThreshold))
    // empty payload: a valid zero-sample WAV
    val (r0, n0, _, _, p0, _) = Multimodal.decodeAudio(Multimodal.encodeWav(Array.empty))
    assert(r0 == Multimodal.SampleRate && n0 == 0 && p0 == 0)
  }

  test("video container: stride seek decodes exactly the selected frames") {
    val raw = Array.tabulate(300)(i => i.toByte) // ceil(300/48) = 7 frames
    val vid = Multimodal.encodeVideo(raw)
    assert(new String(vid.slice(0, 4)) == "GFV1")
    import spark.implicits._
    val assets = Seq((7L, vid)).toDF("doc_id", "payload")
    val frames = Multimodal.decodeSampledFrames(spark, assets, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    frames.foreach { fr =>
      val from = fr.frame_idx * Multimodal.FrameSourceBytes
      val until = math.min(raw.length, from + Multimodal.FrameSourceBytes)
      def expect(ch: Int) = (from until until).filter(i => (i - from) % 3 == ch)
        .map(i => (raw(i) & 0xFF).toLong).sum
      assert(fr.width == Multimodal.BmpWidth && fr.height == 1)
      assert((fr.sum_b, fr.sum_g, fr.sum_r) == ((expect(0), expect(1), expect(2))))
    }
  }

  test("dHash: gradient saturates, uniform zeroes, brightness shift is invariant") {
    // strictly increasing bytes across one 32-px row: every horizontal
    // comparison is true in all 8 (repeated) grid rows
    val grad = Array.tabulate(96)(i => i.toByte)
    val (g0, g1) = Multimodal.dHash(Multimodal.encodeBmp(grad))
    assert(g0 == 0xFFFFFFFFL && g1 == 0xFFFFFFFFL)
    // uniform image: all comparisons tie -> no bits
    val flat = Array.fill(96)(42.toByte)
    assert(Multimodal.dHash(Multimodal.encodeBmp(flat)) == ((0L, 0L)))
    // uniform brightness shift preserves every difference bit
    val raw = Array.tabulate(300)(i => (i * 37 % 200).toByte)
    val shifted = raw.map(b => math.min((b & 0xFF) + 8, 255).toByte)
    assert(Multimodal.dHash(Multimodal.encodeBmp(raw)) ==
      Multimodal.dHash(Multimodal.encodeBmp(shifted)))
  }

  test("image near-dup pairs: banded join finds planted brightness twins") {
    val docs = Tables.documents(spark, sf).limit(50)
    val assets = Multimodal.imageAssets(docs)
      .union(Multimodal.shiftedImageAssets(docs, offset = 8, idOffset = 1000000L))
    val hashes = Multimodal.imageHashes(spark, assets)
    val pairs = Multimodal.imageNearDupPairs(hashes).collect()
    val twinPairs = pairs.filter(r => r.getLong(1) - r.getLong(0) == 1000000L)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    // every original pairs with its twin at hamming 0
    assert(ids.forall(id => twinPairs.exists(r =>
      r.getLong(0) == id && r.getLong(2) == 0L)))
    // banded result == exact all-pairs scan at this scale
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = (for {
      (ia, a0, a1) <- hs; (ib, b0, b1) <- hs if ia < ib
      d = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == exact)
  }

  test("audio trim finds the loud span; all-silence trims to zero") {
    import spark.implicits._
    // bytes near 128 are silent (|s| < 2048 <=> byte within 128±8);
    // plant loud samples at positions 10 and 40 of a 60-sample asset
    val raw = Array.fill(60)(128.toByte)
    raw(10) = 0; raw(40) = 255.toByte
    val silent = Array.fill(30)(130.toByte)
    val assets = Seq(
      (1L, Multimodal.encodeWav(raw)),
      (2L, Multimodal.encodeWav(silent))
    ).toDF("doc_id", "payload")
    val out = Multimodal.audioTrimStats(spark, assets)
      .collect().sortBy(_.doc_id)
    assert(out(0).first_loud == 10 && out(0).last_loud == 40)
    assert(out(0).kept_ms == 31 * 1000L / Multimodal.SampleRate)
    assert(out(1).first_loud == -1 && out(1).last_loud == -1 && out(1).kept_ms == 0)
  }

  test("LSH band plan: S-curve rises with jaccard, threshold falls with bands") {
    val plan = graft.operators.Dedup.lshBandPlan(spark, nPerm = 24).collect()
      .map(r => ((r.getInt(0), r.getDouble(2)), (r.getDouble(3), r.getDouble(4))))
      .toMap
    val bands = plan.keys.map(_._1).toSeq.distinct.sorted
    assert(bands == Seq(1, 2, 3, 4, 6, 8, 12, 24))
    // p_candidate monotone in jaccard for every config
    bands.foreach { b =>
      val curve = (1 to 19).map(i => plan((b, i / 20.0))._1)
      assert(curve.zip(curve.tail).forall { case (lo, hi) => lo <= hi })
    }
    // more bands -> lower S-curve threshold (more permissive)
    val ts = bands.map(b => plan((b, 0.5))._2)
    assert(ts.zip(ts.tail).forall { case (hi, lo) => hi > lo })
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
