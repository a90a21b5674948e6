package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("shingles: 3-grams in order, short docs give empty array") {
    assert(one("a b c d", TextFunctions.shingles(col("text"))) ==
      Seq("a b c", "b c d"))
    assert(one("a b", TextFunctions.shingles(col("text"))) == Seq())
  }

  test("token and subword counts") {
    assert(one("the quick brownfox", TextFunctions.tokenCount(col("text"))) == 3L)
    // ceil(3/4)+ceil(5/4)+ceil(8/4) = 1+2+2
    assert(one("the quick brownfox", TextFunctions.subwordCount(col("text"))) == 5L)
  }

  test("fingerprint matches a reference fold") {
    val toks = Seq("spark", "the", "fast")
    val expected = toks.foldLeft(0L)((acc, t) =>
      (acc * 31L + (t.length.toLong * 131L + t.head.toInt)) % 1000000007L)
    assert(one(toks.mkString(" "), TextFunctions.fingerprint(col("text"))) == expected)
  }

  test("bulk fingerprint equals the scalar fold on real docs") {
    val docs = Tables.documents(spark, sf).limit(100)
    val scalar = docs.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bulk = graft.operators.TextStats.fingerprintBulk(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bulk == scalar)
  }

  test("native fold hash matches split/ascii semantics on edge cases") {
    // Empty string, adjacent/leading/trailing spaces (empty tokens, v=0),
    // multi-byte first characters (full codepoint like ascii()), and a
    // 4-byte supplementary char — all must agree with the HOF fold, both
    // on the codegen path (select) and the interpreted eval (filter-pushed).
    val cases = Seq("", " ", "a  b", " leading", "trailing ",
      "héllo wörld", "日本語 テスト", "𝄞clef music", "one")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val hof = df.select(col("id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = df.select(col("id"),
      graft.expressions.TokenFoldHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof, s"native=$native hof=$hof")
    // Null text -> null fingerprint.
    val n = Seq((1L, Option.empty[String])).toDF("id", "text")
      .select(graft.expressions.TokenFoldHash(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("langId thresholds on marker ratio") {
    assert(one("the cat sat on the mat", TextFunctions.langId(col("text"))) == "en")
    assert(one("xyz qrs tuv wxy zab cde fgh ijk lmn opq rst uvw xyz abc def ghi jkl mno pqr stu",
      TextFunctions.langId(col("text"))) == "unk")
  }

  test("quality score stays in [0,1]") {
    val scores = Tables.documents(spark, sf)
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(scores.getDouble(0) >= 0.0 && scores.getDouble(1) <= 1.0)
  }
}
