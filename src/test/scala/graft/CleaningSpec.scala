package graft

import graft.operators.Cleaning
import org.apache.spark.sql.Row

/** Rule-by-rule behavior of the C4 line filter and the Gopher quality
  * rules (xq64/xq65 cover the bulk path against the oracle; these pin each
  * rule on hand-built documents).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private val prose = "alpha beta gamma delta epsilon zeta."

  test("c4: terminal punctuation required, order preserved, counts exact") {
    val text = Seq(
      "one two three four five six.",   // kept
      "no terminal punctuation here",   // dropped: no terminal
      "short line.",                    // dropped: < 5 words
      "seven eight nine ten eleven!",   // kept
      "does it survive a question mark test?" // kept
    ).mkString("\n")
    val out = Cleaning.c4LineFilter(Seq((1L, text)).toDF("id", "text"),
      "text", "id").collect()
    assert(out.length == 1)
    val Row(_, nLines, nKept, clean) = out.head
    assert(nLines == 5L && nKept == 3L)
    assert(clean == Seq("one two three four five six.",
      "seven eight nine ten eleven!",
      "does it survive a question mark test?").mkString("\n"))
  }

  test("c4: blocklist phrases and code braces kill lines case-insensitively") {
    val text = Seq(
      prose,
      "please enable JavaScript to view the page today.",
      "we updated our Cookie Policy terms recently now.",
      "var x = function() { return 1; }.",
      prose.replace("alpha", "omega")
    ).mkString("\n")
    val out = Cleaning.c4LineFilter(Seq((1L, text)).toDF("id", "text"),
      "text", "id").collect().head
    assert(out.getLong(2) == 2L)
    assert(!out.getString(3).toLowerCase.contains("javascript"))
    assert(!out.getString(3).contains("{"))
  }

  test("c4: documents below minLines survivors are dropped entirely") {
    val df = Seq(
      (1L, s"$prose\n${prose.replace(".", "!")}"), // 2 kept -> stays
      (2L, s"$prose\nno terminal")                 // 1 kept -> dropped
    ).toDF("id", "text")
    val ids = Cleaning.c4LineFilter(df, "text", "id")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("gopher: word-count and stop-word rules fire on a hand-built doc") {
    // 8 words, no stopwords -> fails r_word_count (min 50) and r_stop.
    val doc = "alpha beta gamma delta epsilon zeta eta theta"
    val r = Cleaning.gopherRules(Seq((1L, doc)).toDF("id", "text"),
      "text", "id").collect().head
    val byName = r.schema.fieldNames.zip(r.toSeq).toMap
    assert(byName("n_words") == 8L)
    assert(byName("mean_word_len") == (5 + 4 + 5 + 5 + 7 + 4 + 3 + 5) / 8.0)
    assert(byName("r_word_count") == 0L)
    assert(byName("r_stop") == 0L)
    assert(byName("r_word_len") == 1L)
    assert(byName("pass") == 0L)
  }

  test("gopher: bullet and ellipsis line ratios computed over lines") {
    // 3 lines: 2 bullets (ratio 2/3 <= 0.9 ok), 2 ellipsis (2/3 > 0.3 fail).
    val doc = Seq("- first bullet line...", "- second bullet line...",
      "a normal closing line.").mkString("\n")
    val r = Cleaning.gopherRules(Seq((1L, doc)).toDF("id", "text"),
      "text", "id").collect().head
    val byName = r.schema.fieldNames.zip(r.toSeq).toMap
    assert(byName("r_bullet") == 1L)
    assert(byName("r_ellipsis") == 0L)
  }

  test("gopher: symbol ratio counts '#' and '...' against words") {
    // 10 words, 2 '#' chars -> ratio 0.2 >= 0.1 -> fail.
    val doc = "w1 w2 w3 w4 w5 w6 w7 w8 end# tag#"
    val r = Cleaning.gopherRules(Seq((1L, doc)).toDF("id", "text"),
      "text", "id").collect().head
    val byName = r.schema.fieldNames.zip(r.toSeq).toMap
    assert(byName("symbol_ratio") == 0.2d)
    assert(byName("r_symbol") == 0L)
  }

  test("gopher: a long prose doc with stopwords passes every rule") {
    val doc = (("the data and the table that have rows with values " * 6)
      .trim + ".")
    val r = Cleaning.gopherRules(Seq((1L, doc)).toDF("id", "text"),
      "text", "id").collect().head
    val byName = r.schema.fieldNames.zip(r.toSeq).toMap
    assert(byName("n_words") == 60L)
    assert(byName("pass") == 1L)
  }
}
