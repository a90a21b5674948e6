package graft

import graft.operators.Shards
import java.nio.file.{Files, Paths}

/** Training-shard emission: plan boundaries, manifest digests, and the
  * binary uint16 round trip.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  // hand corpus: doc -> token ids; sizes 3, 4, 2, 5
  private val tokens = Seq(
    (1L, 0L, 7L), (1L, 1L, 8L), (1L, 2L, 9L),
    (2L, 0L, 1L), (2L, 1L, 2L), (2L, 2L, 3L), (2L, 3L, 4L),
    (3L, 0L, 5L), (3L, 1L, 6L),
    (4L, 0L, 10L), (4L, 1L, 11L), (4L, 2L, 12L), (4L, 3L, 13L), (4L, 4L, 14L))

  test("plan: docs never split; boundary falls before the crossing doc") {
    val perDoc = tokens.toDF("id", "pos", "tid")
      .groupBy("id").count().withColumnRenamed("count", "n")
    // shardTokens = 6: cum starts 0,3,7,9 -> shards 0,0,1,1
    val plan = Shards.plan(perDoc, "id", "n", shardTokens = 6L)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    assert(plan == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("manifest digest matches a locally computed canonical stream") {
    val df = tokens.toDF("id", "pos", "tid")
    val m = Shards.manifest(df, "id", "pos", "tid", shardTokens = 6L)
      .orderBy("shard_id").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 7L), (1L, 2L, 7L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(m(0).getString(3) == md5hex("1:7,8,9|2:1,2,3,4"))
    assert(m(1).getString(3) == md5hex("3:5,6|4:10,11,12,13,14"))
  }

  test("writeShards emits little-endian uint16 files that replay the stream") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val out = Shards.writeShards(spark, tokens.toDF("id", "pos", "tid"),
      "id", "pos", "tid", shardTokens = 6L, dir)
      .orderBy("shard_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 7L, 14L), (1L, 7L, 14L)))
    def readU16(path: String): Seq[Int] = {
      val b = Files.readAllBytes(Paths.get(path))
      b.grouped(2).map(p => (p(0) & 0xFF) | ((p(1) & 0xFF) << 8)).toSeq
    }
    assert(readU16(out(0).getString(3)) == Seq(7, 8, 9, 1, 2, 3, 4))
    assert(readU16(out(1).getString(3)) == Seq(5, 6, 10, 11, 12, 13, 14))
  }

  test("writeShardsU32 round-trips real-vocab ids with identical plan and counts") {
    // ids beyond uint16 (a 100k-vocab tokenizer's range) — the uint32 twin's
    // reason to exist; shard boundaries and token counts must match the
    // uint16 emitter's plan exactly, only n_bytes doubles per token.
    val wide = Seq(
      (1L, 0L, 7L), (1L, 1L, 99999L), (1L, 2L, 9L),
      (2L, 0L, 1L), (2L, 1L, 131072L), (2L, 2L, 3L), (2L, 3L, 4L),
      (3L, 0L, 5L), (3L, 1L, 4294967295L), // uint32 max
      (4L, 0L, 10L), (4L, 1L, 11L), (4L, 2L, 12L), (4L, 3L, 13L), (4L, 4L, 14L))
    val dir = Files.createTempDirectory("graft-shards-u32").toString
    val out = Shards.writeShardsU32(spark, wide.toDF("id", "pos", "tid"),
      "id", "pos", "tid", shardTokens = 6L, dir)
      .orderBy("shard_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 7L, 28L), (1L, 7L, 28L)))
    def readU32(path: String): Seq[Long] = {
      val b = Files.readAllBytes(Paths.get(path))
      b.grouped(4).map(p => (p(0) & 0xFFL) | ((p(1) & 0xFFL) << 8) |
        ((p(2) & 0xFFL) << 16) | ((p(3) & 0xFFL) << 24)).toSeq
    }
    assert(readU32(out(0).getString(3)) == Seq(7L, 99999L, 9L, 1L, 131072L, 3L, 4L))
    assert(readU32(out(1).getString(3)) == Seq(5L, 4294967295L, 10L, 11L, 12L, 13L, 14L))
  }

  test("writeShardsU32 fails loudly past uint32 range") {
    val dir = Files.createTempDirectory("graft-shards-u32-bad").toString
    val bad = Seq((1L, 0L, 7L), (1L, 1L, 4294967296L)).toDF("id", "pos", "tid")
    val e = intercept[Exception] {
      Shards.writeShardsU32(spark, bad, "id", "pos", "tid", 6L, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds uint32 range")))
  }

  test("writeShards fails loudly on a token id outside uint16 range") {
    val dir = Files.createTempDirectory("graft-shards-bad").toString
    val bad = Seq((1L, 0L, 7L), (1L, 1L, 70000L)).toDF("id", "pos", "tid")
    val e = intercept[Exception] {
      Shards.writeShards(spark, bad, "id", "pos", "tid", 6L, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds uint16 range")))
  }
}
