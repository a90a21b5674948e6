package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential spec for the native text-rule expressions
  * (graft.expressions.{GopherStats, C4LineStats, LinedTextExpr}): each must
  * reproduce the interpreted Column-program it replaced byte-for-byte, so
  * the old forms are spelled out here as the reference and both run over a
  * corpus of adversarial strings — non-ASCII words, the U+2022 bullet,
  * "...."/ellipsis overlaps, empty lines, trailing separators.
  */
class TextRulesSpec extends SparkSpec {
  import spark.implicits._

  private val docs: DataFrame = Seq(
    (0L, "the cat sat on the mat."),
    (1L, "word"),
    (2L, ""),
    (3L, "a  b   c"), // empty tokens from repeated spaces
    (4L, "trailing space "),
    (5L, "line one.\nline two!\n\nline four?"),
    (6L, "ends with newline.\n"),
    (7L, "- bullet one.\n• bullet two.\nplain line."),
    (8L, "dots....\nmore.....\nexact...\n..."),
    (9L, "## # hash ## tags #"),
    (10L, "café naïve résumé and the Kelvin sign"),
    (11L, "The BE tO Of AND that HAVE with THE"),
    (12L, "{ code } function f() { return 0; }\nprose line here."),
    (13L, "please enable JavaScript and accept our Cookie Policy.\ngood prose line with many words."),
    (14L, "\n\nstarts with empty lines.\n"),
    (15L, "中文 文本 mixed ascii words."),
    (16L, "...\n...leading\ntrailing...\n..middle..")
  ).toDF("doc_id", "text")

  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The pre-native Column-program form of the Gopher raw counts
    * (Cleaning.scala before round 4), kept verbatim as the reference.
    */
  private def gopherRef: Seq[(String, Column)] = {
    val t = col("text")
    val lines = split(t, "\n")
    val words = split(regexp_replace(t, "\n", " "), " ")
    Seq(
      "n_words" -> size(words).cast("long"),
      "sum_word_len" ->
        aggregate(words, lit(0L), (a, w) => a + length(w)),
      "n_hash" ->
        (length(t) - length(regexp_replace(t, "#", ""))).cast("long"),
      "n_ellipsis" ->
        ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
          .cast("long"),
      "n_lines" -> size(lines).cast("long"),
      "n_bullet" -> size(filter(lines,
        l => l.startsWith("- ") || l.startsWith("• "))).cast("long"),
      "n_ell_line" ->
        size(filter(lines, l => l.endsWith("..."))).cast("long"),
      "n_alpha" ->
        size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long"),
      "n_stop" -> size(filter(words,
        w => lower(w).isInCollection(gopherStopwords))).cast("long"))
  }

  test("GopherStats matches the Column-program reference on edge cases") {
    val nRows = docs
      .select(col("doc_id"), graft.expressions.GopherStats(col("text")).as("_s"))
      .select(col("doc_id") +: gopherRef.map { case (n, _) =>
        col("_s").getField(n).as(n) }: _*)
      .orderBy("doc_id").collect()
    val rRows = docs.select(col("doc_id") +: gopherRef.map { case (n, c) =>
      c.as(n) }: _*).orderBy("doc_id").collect()
    assert(nRows.length == rRows.length)
    nRows.zip(rRows).foreach { case (a, b) =>
      assert(a == b, s"gopher mismatch for doc ${a.getLong(0)}: $a vs $b") }
  }

  private val blocklist = Seq("javascript", "cookie policy", "lorem ipsum",
    "privacy policy", "terms of use")

  /** The pre-native C4 keep-line predicate, verbatim. */
  private def isKeptLineRef(l: Column, minWords: Int): Column = {
    val terminal = substring(l, -1, 1).isin(".", "!", "?", "\"")
    val enoughWords = size(split(l, " ")) >= minWords
    val noBrace = !l.contains("{")
    val lowered = lower(l)
    val noBoiler = blocklist.map(p => !lowered.contains(p)).reduce(_ && _)
    terminal && enoughWords && noBrace && noBoiler
  }

  test("C4LineStats matches the Column-program reference on edge cases") {
    for (minWords <- Seq(1, 3, 5)) {
      val native = docs
        .select(col("doc_id"),
          graft.expressions.C4LineStats(col("text"), minWords, blocklist)
            .as("_s"))
        .select(col("doc_id"), col("_s.n_lines").as("n_lines"),
          col("_s.kept").as("kept"))
        .orderBy("doc_id").collect()
      val ref = docs
        .select(col("doc_id"), split(col("text"), "\n").as("_lines"))
        .select(col("doc_id"),
          size(col("_lines")).cast("long").as("n_lines"),
          filter(col("_lines"), l => isKeptLineRef(l, minWords)).as("kept"))
        .orderBy("doc_id").collect()
      native.zip(ref).foreach { case (a, b) =>
        assert(a == b,
          s"c4 mismatch (minWords=$minWords) doc ${a.getLong(0)}: $a vs $b") }
    }
  }

  /** The pre-native linedText renderer, verbatim (ExtensionQueries). */
  private def linedTextRef: Column = {
    val toks = split(col("text"), " ")
    val nChunks = ceil(size(toks).cast("double") / 8.0d).cast("int")
    val body = transform(sequence(lit(0), nChunks - 1), i => {
      val chunk = array_join(slice(toks, i * 8 + 1, lit(8)), " ")
      val m = (col("doc_id") * 31 + i.cast("long")) % 5
      when(m === 0, concat(chunk, lit(".")))
        .when(m === 1, concat(chunk, lit("!")))
        .when(m === 2, chunk)
        .when(m === 3, concat(lit("- "), chunk, lit(".")))
        .otherwise(concat(chunk, lit("...")))
    })
    val withBoiler = when(col("doc_id") % 3 === 0,
      concat(array(
        lit("please enable javascript and accept our cookie policy.")), body))
      .otherwise(body)
    val withBrace = when(col("doc_id") % 7 === 0,
      concat(withBoiler, array(lit("function f() { return 0; }"))))
      .otherwise(withBoiler)
    array_join(withBrace, "\n")
  }

  test("LinedTextExpr matches the Column-program renderer on real corpus text") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .limit(200)
    val both = corpus.select(col("doc_id"),
      graft.expressions.LinedTextExpr(col("text"), col("doc_id")).as("a"),
      linedTextRef.as("b"))
    assert(both.where(col("a") =!= col("b")).count() == 0L)
    // and on the adversarial local docs (empty text, repeated spaces, unicode)
    val local = docs.select(col("doc_id"),
      graft.expressions.LinedTextExpr(col("text"), col("doc_id")).as("a"),
      linedTextRef.as("b"))
    assert(local.where(col("a") =!= col("b")).count() == 0L)
  }
}
