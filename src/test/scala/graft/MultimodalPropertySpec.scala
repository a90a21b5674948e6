package graft

import graft.operators.Multimodal
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the multimodal codecs over arbitrary byte payloads
  * (plain ScalaCheck Gen over fixed seeds, the repo's bridge-free
  * pattern): every encoder→decoder round trip must reproduce the source
  * statistics exactly for ANY input, not just the corpus fixtures.
  */
class MultimodalPropertySpec extends SparkSpec {

  private def randomBytes(trial: Long, maxN: Int): Array[Byte] = {
    val gen = for {
      n <- Gen.choose(0, maxN)
      bs <- Gen.listOfN(n, Gen.choose(0, 255))
    } yield bs.map(_.toByte).toArray
    gen.apply(Gen.Parameters.default, Seed(trial)).get
  }

  test("WAV round trip reproduces exact amplitude stats for arbitrary bytes") {
    (1L to 8L).foreach { trial =>
      val raw = randomBytes(trial, 700)
      val (rate, n, sumAbs, energy, peak, silent) =
        Multimodal.decodeAudio(Multimodal.encodeWav(raw))
      val samples = raw.map(b => ((b & 0xFF) - 128) * 256)
      assert(rate == Multimodal.SampleRate && n == raw.length, s"trial $trial")
      assert(sumAbs == samples.map(s => math.abs(s).toLong).sum, s"trial $trial")
      assert(energy == samples.map(s => math.abs(s).toLong * math.abs(s)).sum,
        s"trial $trial")
      assert(peak == (if (samples.isEmpty) 0L else samples.map(s => math.abs(s).toLong).max),
        s"trial $trial")
      assert(silent == samples.count(s => math.abs(s) < Multimodal.SilenceThreshold),
        s"trial $trial")
    }
  }

  test("video container frames cover the source bytes exactly, any stride") {
    (1L to 6L).foreach { trial =>
      val raw = randomBytes(trial, 700)
      val vid = Multimodal.encodeVideo(raw)
      import spark.implicits._
      val assets = Seq((trial, vid)).toDF("doc_id", "payload")
      // stride 1: every frame decoded; per-channel sums over ALL frames
      // must equal the whole-payload sums (zero pad adds nothing)
      val frames = Multimodal.decodeSampledFrames(spark, assets, stride = 1)
        .collect()
      val expFrames = math.max(1,
        (raw.length + Multimodal.FrameSourceBytes - 1) / Multimodal.FrameSourceBytes)
      assert(frames.length == expFrames, s"trial $trial")
      def whole(ch: Int) = raw.indices.filter(_ % 3 == ch)
        .map(i => (raw(i) & 0xFF).toLong).sum
      assert(frames.map(_.sum_b).sum == whole(0), s"trial $trial")
      assert(frames.map(_.sum_g).sum == whole(1), s"trial $trial")
      assert(frames.map(_.sum_r).sum == whole(2), s"trial $trial")
    }
  }

  test("dHash brightness invariance holds for arbitrary clamp-free payloads") {
    (1L to 8L).foreach { trial =>
      val raw = randomBytes(trial, 700).map(b => (b & 0x7F).toByte) // 0..127
      val shifted = raw.map(b => ((b & 0xFF) + 8).toByte)
      assert(Multimodal.dHash(Multimodal.encodeBmp(raw)) ==
        Multimodal.dHash(Multimodal.encodeBmp(shifted)), s"trial $trial")
    }
  }

  test("BMP and PNG decode the same features for arbitrary bytes") {
    (1L to 6L).foreach { trial =>
      val raw = randomBytes(trial, 700)
      assert(Multimodal.decodeImage(Multimodal.encodeBmp(raw)) ==
        Multimodal.decodeImage(Multimodal.encodePng(raw)), s"trial $trial")
    }
  }
}
