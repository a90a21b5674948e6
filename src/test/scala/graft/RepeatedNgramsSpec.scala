package graft

import graft.operators.RepeatedNgrams

/** Constructed-input behavior of the ExactSubstr-style repeated-span
  * operator (xq46's oracle covers the corpus path).
  */
class RepeatedNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int, minCount: Long) =
    RepeatedNgrams.repeatedSpans(docs.toDF("doc_id", "text"),
      "text", "doc_id", n, minCount)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("corpus-frequent grams produce spans; infrequent grams do not") {
    // "a b" occurs 3x corpus-wide (>= minCount) -> hot; everything else 1x.
    val out = spans(Seq(
      (1L, "a b c a b"),
      (2L, "z a b q")), n = 2, minCount = 3)
    // doc 1: hits at 0 and 3 -> 3 > prev_end 2 -> two separate spans
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 2L, 1L), (1L, 3L, 5L, 2L, 1L), (2L, 1L, 3L, 2L, 1L)))
  }

  test("touching intervals merge into one maximal span") {
    // doc 1 hits "a b" at 0 and 2: [0,2) + [2,4) touch -> one [0,4) span
    val out = spans(Seq(
      (1L, "a b a b"),
      (2L, "a b x"),
      (3L, "y a b")), n = 2, minCount = 3)
    assert(out.head == ((1L, 0L, 4L, 4L, 2L)))
  }

  test("within-doc repetition counts toward the corpus frequency") {
    // "q w" appears 3x inside ONE doc -> still hot (occurrence count,
    // not document frequency — ExactSubstr semantics)
    val out = spans(Seq((1L, "q w q w q w"), (2L, "other words here")),
      n = 2, minCount = 3)
    assert(out.toSeq == Seq((1L, 0L, 6L, 6L, 3L)))
  }
}
