package graft

import graft.operators.NgramLm

/** Hand-computed bigram-LM scores (xq48's oracle pins the corpus path). */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // train: bigrams (a,b)x2 (b,a)x2 (a,c)x1 -> c1: a=3 b=2; V={a,b,c}=3
  private val train = Seq((100L, "a b a b a c")).toDF("doc_id", "text")

  private def score(docs: Seq[(Long, String)]) =
    NgramLm.scoreDocs(train, docs.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("known bigram: P(b|a) = (2+1)/(3+3) = 1/2 -> ln 2 nats") {
    val out = score(Seq((1L, "a b")))
    assert(out.toSeq == Seq((1L, 1L, 693147L, 0.693147d)))
  }

  test("OOV context and OOV word both smooth to 1/V = 1/3") {
    // (z,q): c12=0, c1(z)=0 -> (0+1)/(0+3); (c,a): c never a context -> same
    val out = score(Seq((2L, "z q"), (3L, "a c a")))
    // doc 3: P(c|a) = (1+1)/(3+3) = 1/3, P(a|c) = 1/3 -> 2x 1098612
    assert(out.toSeq == Seq(
      (2L, 1L, 1098612L, 1.098612d),
      (3L, 2L, 2197224L, 1.098612d)))
  }

  test("single-token and empty docs produce no score rows") {
    assert(score(Seq((4L, "a"), (5L, ""))).isEmpty)
  }

  test("scores are stable under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = NgramLm.scoreDocs(docs, docs, "text", "doc_id")
    val b = NgramLm.scoreDocs(docs.repartition(11), docs.repartition(7), "text", "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("persisted-index probe is bit-identical to the strict recompute") {
    val docs = Tables.documents(spark, sf)
    val trainSplit = docs.where(org.apache.spark.sql.functions.col("source") === "src0")
    val batch = docs.where(org.apache.spark.sql.functions.col("source") === "src3")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-idx").toString
    NgramLm.writeLmIndex(trainSplit, "text", "doc_id", dir)
    val strict = NgramLm.scoreDocs(trainSplit, batch, "text", "doc_id")
    val probed = NgramLm.scoreLmIndex(spark, dir, batch, "text", "doc_id")
    assert(probed.count() > 0)
    assert(strict.exceptAll(probed).isEmpty && probed.exceptAll(strict).isEmpty,
      "index probe must reproduce the strict scores bit-exactly")
  }

  test("append-delta refresh == full rebuild over the grown corpus") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables.documents(spark, sf)
    val trainSplit = docs.where(col("source") === "src0")
    val batch = docs.where(col("source") === "src3")
    // stage: generation A files, then an appended B batch
    val staged = java.nio.file.Files.createTempDirectory("graft-lm-app").toString
    trainSplit.where(pmod(col("doc_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(staged)
    val gen1 = java.nio.file.Files.createTempDirectory("graft-lm-g1").toString
    NgramLm.writeLmIndex(spark.read.parquet(staged), "text", "doc_id", gen1)
    val manifest = new java.io.File(staged).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).toSet
    trainSplit.where(pmod(col("doc_id"), lit(2)) === 1)
      .write.mode("append").parquet(staged)
    val newFiles = new java.io.File(staged).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).filterNot(manifest).toSeq
    assert(newFiles.nonEmpty, "the append must add data files")
    val gen2 = java.nio.file.Files.createTempDirectory("graft-lm-g2").toString
    NgramLm.appendLmIndex(spark,
      operators.IndexStore.AppendDelta(gen1, newFiles), gen2, "text", "doc_id")
    // full rebuild over the grown corpus is the reference
    val full = java.nio.file.Files.createTempDirectory("graft-lm-full").toString
    NgramLm.writeLmIndex(spark.read.parquet(staged), "text", "doc_id", full)
    val a = NgramLm.scoreLmIndex(spark, gen2, batch, "text", "doc_id")
    val b = NgramLm.scoreLmIndex(spark, full, batch, "text", "doc_id")
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "probe after append must equal the full retrain bit-exactly")
    // the merged tables themselves must be count-identical, not just the
    // scores (a score tie could hide a miscount behind smoothing)
    val c12a = spark.read.parquet(s"$gen2/c12")
    val c12b = spark.read.parquet(s"$full/c12")
    assert(c12a.exceptAll(c12b).isEmpty && c12b.exceptAll(c12a).isEmpty)
    val va = spark.read.parquet(s"$gen2/stats").head.getLong(0)
    val vb = spark.read.parquet(s"$full/stats").head.getLong(0)
    assert(va == vb)
  }
}
