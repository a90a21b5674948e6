package graft

import graft.operators.Vocabulary
import org.apache.spark.sql.functions._

/** Edge cases of the coverage/OOV report the xq97 oracle's happy path does
  * not pin: an all-OOV source, exact ratio arithmetic, and OOV TYPE
  * (distinct) vs occurrence counting.
  */
class VocabularySpec extends SparkSpec {
  import spark.implicits._

  test("coverageReport: all-OOV source, exact ratio, distinct OOV types") {
    val docs = Seq(
      (1L, "a a a b", "s1"), // a:3 b:1
      (2L, "a b c c", "s1"), // c twice in one doc
      (3L, "zz zz yy", "s2") // s2 shares nothing with the vocab
    ).toDF("doc_id", "text", "source")
    // vocab = terms with corpus count >= 3: a (4), zz... zz has 2 -> out; c 2 -> out
    val vocab = Vocabulary.build(docs, "text", minCount = 3L)
    assert(vocab.select("term").collect().map(_.getString(0)).toSet == Set("a"))
    val rep = Vocabulary.coverageReport(docs, "text", "source", vocab)
      .orderBy("source").collect()
    val s1 = rep(0)
    assert(s1.getString(0) == "s1")
    assert(s1.getLong(1) == 8L && s1.getLong(2) == 4L) // 8 tokens, 4 'a'
    assert(s1.getDouble(3) == 4.0 / 8.0) // exact IEEE division
    assert(s1.getLong(4) == 2L) // OOV TYPES b, c — not 4 occurrences
    val s2 = rep(1)
    assert(s2.getString(0) == "s2")
    assert(s2.getLong(2) == 0L && s2.getDouble(3) == 0.0 && s2.getLong(4) == 2L)
  }
}
