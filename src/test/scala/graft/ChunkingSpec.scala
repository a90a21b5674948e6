package graft

import graft.operators.{Chunking, Vocabulary}
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk boundaries: stride, overlap, short tail, tiny doc") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, size 8 stride 6
      (2L, "a b c")                                   // shorter than one window
    ).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, "text", "doc_id", size = 8, overlap = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, (1 to 8).map(i => s"t$i").mkString(" "), 8L),
      (1L, 1L, (7 to 10).map(i => s"t$i").mkString(" "), 4L), // overlap t7,t8
      (2L, 0L, "a b c", 3L)))
  }

  test("cdc chunks reconstruct the doc and realign after an insertion") {
    val base = (1 to 200).map(i => s"w${i * 7 % 53}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, "inserted " + base) // one leading token shifts every position
    ).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(docs, "text", "doc_id",
      window = 4, avgSize = 16)
    // Reassembly: in-order concatenation is the original text; token
    // counts cover the doc exactly.
    val byDoc = chunks.orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().groupBy(_._1)
    assert(byDoc(1L).map(_._2).mkString(" ") == base)
    assert(byDoc(2L).map(_._2).mkString(" ") == "inserted " + base)
    assert(byDoc(1L).map(_._3).sum == 200L)
    // Content-defined realignment: the shifted twin shares most chunk
    // hashes with the original; positional chunking shares none.
    val h1 = chunks.where(col("doc_id") === 1L)
      .select("chunk_hash").as[String].collect().toSet
    val h2 = chunks.where(col("doc_id") === 2L)
      .select("chunk_hash").as[String].collect().toSet
    val shared = (h1 & h2).size
    assert(shared >= 2, s"CDC must realign after the insertion, shared=$shared")
    val fixed1 = Chunking.chunk(docs.where(col("doc_id") === 1L), "text",
      "doc_id", size = 16, overlap = 0).select("chunk_text").as[String].collect().toSet
    val fixed2 = Chunking.chunk(docs.where(col("doc_id") === 2L), "text",
      "doc_id", size = 16, overlap = 0).select("chunk_text").as[String].collect().toSet
    assert((fixed1 & fixed2).size < shared,
      "fixed-size chunking must lose alignment that CDC keeps")
    // Deterministic under repartition.
    val again = Chunking.cdcChunks(docs.repartition(5), "text", "doc_id",
      window = 4, avgSize = 16)
      .orderBy("doc_id", "chunk_idx").select("chunk_hash").as[String].collect().toSeq
    assert(again == chunks.orderBy("doc_id", "chunk_idx")
      .select("chunk_hash").as[String].collect().toSeq)
  }

  test("chunks reconstruct the document (stride-aligned concatenation)") {
    val docs = Tables.documents(spark, sf).limit(50)
    val size = 16
    val overlap = 4
    val chunks = Chunking.chunk(docs, "text", "doc_id", size, overlap)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2))
    val originals = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    originals.foreach { case (id, text) =>
      val parts = chunks(id)
      // Drop each chunk's leading `overlap` tokens except the first chunk.
      val rebuilt = parts.zipWithIndex.flatMap { case ((_, _, t, _), i) =>
        val toks = t.split(" ", -1).toSeq
        if (i == 0) toks else toks.drop(overlap)
      }.mkString(" ")
      assert(rebuilt == text, s"doc $id reconstruction mismatch")
    }
  }

  test("chunking plan has no shuffle (embarrassingly parallel)") {
    val plan = Chunking.chunk(Tables.documents(spark, sf), "text", "doc_id",
      32, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("vocabulary: dense ids, frequency order, OOV maps to 0") {
    val docs = Seq(
      (1L, "hot hot hot warm warm rare"),
      (2L, "hot warm")
    ).toDF("doc_id", "text")
    val vocab = Vocabulary.build(docs, "text", minCount = 2L)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(vocab == Seq(("hot", 1L, 4L), ("warm", 2L, 3L))) // rare dropped
    val mapped = Vocabulary.mapTokens(docs, "text", "doc_id",
      Vocabulary.build(docs, "text", minCount = 2L))
      .where(col("doc_id") === 1L).orderBy("pos")
      .select("term_id").as[Long].collect().toSeq
    assert(mapped == Seq(1L, 1L, 1L, 2L, 2L, 0L)) // rare -> OOV 0
  }
}
