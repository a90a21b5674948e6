package graft

import graft.expressions.{NormalizeText, PiiStats}
import graft.operators.Redaction
import org.apache.spark.sql.functions._

/** Byte-exactness of the single-pass scrub kernels against their
  * Column-program (java-regex) reference forms, on the corpus plus
  * adversarial strings covering every boundary/backtrack corner the regex
  * semantics have.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    // normalize corners
    "  Leading and trailing  ",
    "A.B!C?D,E;F:G",
    "tabs\tand\nnewlines are removed not spaced",
    "a . b  ..  c",
    "UPPER lower 0123456789",
    "ünïcödé ÀÉÎ Κελσιος K degrees", // kelvin sign lowers INTO ascii 'k'
    "İstanbul", // dotted capital I -> "i" + combining dot
    "", "   ", "...", "innerspace",
    // email corners
    "reach a@b.com or c.d+x@sub.example.org, call 555-123-4567, host 192.168.0.1 ok",
    "admin@10.0.0.1.example.com only",
    "a@b.co7 trailing digit stops the tld",
    "x a@b.cd@e.fg y",
    "no@dot no@@at a@b a@b.c a@b.cde",
    "%weird+local-part._x@host-name.org!",
    "@nohost.com user@ @@",
    "two a@b.com c@d.org emails",
    // phone corners
    "5551-123-4567 and 555-123-45678 and 555-123-4567",
    "x555-123-4567 555-123-4567x _555-123-4567",
    "555-123-4567555-123-4567",
    "(555-123-4567) ends 555-123-4567",
    // ip corners
    "1234.5.6.7 and 1.2.3.4567 and 10.0.255.7",
    "a1.2.3.4 1.2.3.4a 1.2.3.4. ...1.2.3.4...",
    "192.168.0.1192.168.0.2 and 1.2.3.4.5",
    "ip 10.0.37.7 mail user91@example.com call 555-867-5309")

  test("normalizeText is byte-identical to the regex pipeline") {
    val refCol = trim(regexp_replace(
      regexp_replace(lower(col("t")), "[^a-z0-9 ]", ""), " +", " "))
    val docs = Tables.documents(spark, sf).select(col("text").as("t"))
      .union(adversarial.toDF("t"))
    val diff = docs.select(refCol.as("ref"), NormalizeText(col("t")).as("got"))
      .where(not(col("ref") <=> col("got")))
    assert(diff.count() === 0)
  }

  test("piiStats matches the six-regex Redaction form on corpus + corners") {
    // xq36's injection shape, applied to adversarial rows too
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .union(adversarial.zipWithIndex
        .map { case (t, i) => (100000L + i, t) }.toDF("doc_id", "text"))
    val injected = base.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" mail user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" call 555-867-5309"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7"))).otherwise(lit(""))).as("text"))
    val got = Redaction.redact(injected, "text", "doc_id")
    val ref = Redaction.redactRegex(injected, "text", "doc_id")
      .withColumnRenamed("n_emails", "r_emails")
      .withColumnRenamed("n_phones", "r_phones")
      .withColumnRenamed("n_ips", "r_ips")
      .withColumnRenamed("redacted", "r_redacted")
    val diff = got.join(ref, "doc_id").where(
      not(col("n_emails") <=> col("r_emails")) ||
        not(col("n_phones") <=> col("r_phones")) ||
        not(col("n_ips") <=> col("r_ips")) ||
        not(col("redacted") <=> col("r_redacted")))
    assert(diff.count() === 0)
  }

  test("redaction replaces masks in the documented email->phone->ip order") {
    // an email whose mask boundary EXPOSES a phone for the second pass:
    // counts are on raw (0 phones), masking is sequential (phone masked)
    val r = Redaction.redact(
      Seq((1L, "user@x.co555-867-5309")).toDF("id", "text"), "text", "id")
      .collect().head
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 0L)
    assert(r.getString(4) === "<EMAIL><PHONE>")
  }

  test("null text propagates") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a@b.com X")))
      .toDF("id", "text")
    val out = df.select(col("id"), PiiStats(col("text")).as("p"),
      NormalizeText(col("text")).as("n")).orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getStruct(1).getLong(0) === 1L)
    assert(out(1).getString(2) === "abcom x")
  }
}
