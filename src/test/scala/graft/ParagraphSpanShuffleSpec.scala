package graft

import graft.operators.{Decontamination, Dedup, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Constructed-input behavior of the paragraph dedup, contamination-span,
  * and shuffle-index operators (oracle queries cover the corpus path).
  */
class ParagraphSpanShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("paragraph dedup removes cross-doc paragraphs, keeps order, keeps empty docs") {
    // para size 2: doc 1 = [A B][C D][E F], doc 2 = [C D][G H], doc 3 = [C D]
    val docs = Seq(
      (1L, "A B C D E F"),
      (2L, "C D G H"),
      (3L, "C D")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateParagraphs(docs, "text", "doc_id",
      paraWords = 2, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "A B E F"))) // shared [C D] gone, order kept
    assert(out(1) == ((2L, 2L, 1L, "G H")))
    assert(out(2) == ((3L, 1L, 0L, "")))        // pure boilerplate -> empty, not dropped
  }

  test("paragraph dedup counts DISTINCT docs (intra-doc repetition is not boilerplate)") {
    val docs = Seq((1L, "A B A B"), (2L, "X Y")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateParagraphs(docs, "text", "doc_id", 2, 2)
      .where($"doc_id" === 1L).collect().head
    assert(out.getString(3) == "A B A B") // repeated within ONE doc -> kept
  }

  test("contamination spans merge consecutive hits into maximal runs") {
    // eval holds grams "a b" and "b c" -> train positions 0,1 are one span;
    // "x y" at position 4 is a second span.
    val train = Seq((10L, "a b c q r x y")).toDF("doc_id", "text")
    val eval = Seq((90L, "a b c"), (91L, "p x y")).toDF("doc_id", "text")
    val spans = Decontamination.contaminatedSpans(train, eval, "text", "doc_id", n = 2)
      .orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((0L, 2L, 3L), (5L, 1L, 2L)))
  }

  test("shuffle index equals the sequential global row_number") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val twoPass = Sampling.shuffleIndex(docs, "doc_id")
    val sequential = docs.withColumn("shuffle_pos",
      row_number().over(Window.orderBy(md5($"doc_id".cast("string")), $"doc_id"))
        .cast("long") - 1L)
    assert(twoPass.exceptAll(sequential).isEmpty && sequential.exceptAll(twoPass).isEmpty)
  }

  test("shuffle index is stable under input repartitioning") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val a = Sampling.shuffleIndex(docs, "doc_id")
    val b = Sampling.shuffleIndex(docs.repartition(7), "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
