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
