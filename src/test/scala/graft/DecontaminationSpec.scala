package graft

import graft.operators.Decontamination
import org.apache.spark.sql.functions._

/** The locate→excise decontamination pair (xq24/xq39/xq104): planted
  * benchmark quotes are found AND removed, clean docs pass through
  * byte-identical, edge shapes (full contamination, overlapping spans,
  * doc shorter than n) behave.
  */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val evalSet = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("excise removes exactly the covered tokens, in order") {
    val train = Seq(
      // quote embedded mid-document: the 4-gram hits cover the quote's
      // tokens and nothing else
      (1L, "intro words here the quick brown fox jumps over the lazy dog and then more"),
      // clean doc: byte-identical pass-through
      (2L, "completely unrelated content with zero overlap whatsoever right here"),
      // fully contaminated: comes back empty
      (3L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = Decontamination.exciseSpans(train, evalSet, "text", "doc_id", n = 4)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq

    val (id1, clean1, nt1, nk1, nr1) = out(0)
    assert(id1 == 1L)
    // the 9 quote tokens are gone; every surviving token keeps its order
    assert(clean1 == "intro words here and then more", s"got '$clean1'")
    assert(nt1 == 15 && nk1 == 6 && nr1 == 9)

    val (_, clean2, nt2, nk2, nr2) = out(1)
    assert(clean2 == "completely unrelated content with zero overlap whatsoever right here")
    assert(nt2 == nk2 && nr2 == 0)

    val (_, clean3, nt3, nk3, nr3) = out(2)
    assert(clean3 == "" && nk3 == 0 && nr3 == nt3 && nt3 == 9)
  }

  test("overlapping hits merge: covered positions union, no double-removal") {
    // eval holds two overlapping 4-grams of one 5-token run; the union of
    // covered positions is the 5-token run, removed once
    val ev = Seq((200L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta epsilon y")).toDF("doc_id", "text")
    val out = Decontamination.exciseSpans(train, ev, "text", "doc_id", n = 4)
      .as[(Long, String, Long, Long, Long)].collect().head
    assert(out._2 == "x y" && out._4 == 2 && out._5 == 5, s"got $out")
  }

  test("docs shorter than n carry no grams and pass through") {
    val train = Seq((1L, "too short"), (2L, "the quick brown")).toDF("doc_id", "text")
    val out = Decontamination.exciseSpans(train, evalSet, "text", "doc_id", n = 4)
      .orderBy("doc_id").as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq("too short", "the quick brown"))
    assert(out.forall(r => r._5 == 0))
  }
}
