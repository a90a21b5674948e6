package graft

import graft.operators.Bpe

/** Hand-traced BPE merges (xq50's oracle pins the corpus path). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def fit(text: String, merges: Int) =
    Bpe.fit(Seq((1L, text)).toDF("doc_id", "text"), "text", merges)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def syms(text: String, merges: Int) =
    Bpe.symbolized(Seq((1L, text)).toDF("doc_id", "text"), "text", merges)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))

  test("merge order follows frequency-weighted pair counts") {
    // words: ab x3, ac x1 -> (a,b)=3 first, then (a,c)=1
    assert(fit("ab ab ab ac", 2).toSeq ==
      Seq((1L, "a", "b", 3L), (2L, "a", "c", 1L)))
    assert(syms("ab ab ab ac", 2).toSeq ==
      Seq(("ab", 3L, "ab"), ("ac", 1L, "ac")))
  }

  test("count ties break to the lexicographically smallest (left, right)") {
    // (b,a)=2 and (c,a)=2 tie -> (b,a) wins
    assert(fit("ba ba ca ca", 1).head == ((1L, "b", "a", 2L)))
  }

  test("overlapping occurrences merge greedily left-to-right") {
    // "aaa": (a,a) occurs at 2 positions; one merge gives "aa a", not "a aa"
    assert(syms("aaa", 1).head == (("aaa", 1L, "aa a")))
    // the second merge then fuses (aa, a)
    assert(fit("aaa", 2)(1) == ((2L, "aa", "a", 1L)))
    assert(syms("aaa", 2).head == (("aaa", 1L, "aaa")))
  }

  test("tokenize applies the learned merges to the corpus stream") {
    val docs = Seq((1L, "ab ab ab ac")).toDF("doc_id", "text")
    // after 1 merge (a,b): ab -> 1 unit, ac -> "a c" = 2 units
    val one = Bpe.tokenize(docs, "text", "doc_id", merges = 1).collect().head
    assert((one.getLong(1), one.getLong(2), one.getDouble(3)) == ((4L, 5L, 1.25d)))
    // after 2 merges both words are single units
    val two = Bpe.tokenize(docs, "text", "doc_id", merges = 2).collect().head
    assert((two.getLong(1), two.getLong(2), two.getDouble(3)) == ((4L, 4L, 1.0d)))
  }

  test("training is stable under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.fit(docs, "text", 3)
    val b = Bpe.fit(docs.repartition(13), "text", 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
