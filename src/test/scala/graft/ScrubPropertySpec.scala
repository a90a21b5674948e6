package graft

import graft.expressions.Scrub
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the scrub kernels directly against java.util.regex — the engine
  * whose semantics they claim byte-for-byte (Spark's regexp_replace /
  * regexp_extract_all compile these exact patterns with default flags).
  * The generator is biased toward match boundaries: PII-shaped fragments
  * concatenated with digits/letters/dots on either side, plus the Unicode
  * lowering corners (U+212A lowers INTO ASCII 'k', U+0130 expands).
  */
class ScrubPropertySpec extends AnyFunSuite {

  private val fragments = Gen.oneOf(
    "a@b.co", "x@y.org", "user@10.0.0.1.example.com", "a@b.co7", "@", "@@",
    "555-123-4567", "5551-123-4567", "555-123-45678", "-555-123-4567",
    "1.2.3.4", "1234.5.6.7", "1.2.3.4567", "10.0.255.7", "1.2.3.4.5",
    ".", "..", "-", "_", "%", "+", " ", "  ", "\n", "\t",
    "KKİ", "é Κελσιος", "abc", "XYZ", "0123", "7", "q")

  private def randomText(trial: Long): String = {
    val gen = for {
      n <- Gen.choose(0, 24)
      parts <- Gen.listOfN(n, fragments)
    } yield parts.mkString
    gen.apply(Gen.Parameters.default, Seed(trial)).get
  }

  private val emailP = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val phoneP = java.util.regex.Pattern.compile(
    "\\b\\d{3}-\\d{3}-\\d{4}\\b")
  private val ipP = java.util.regex.Pattern.compile(
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  private def countOf(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s); var n = 0L
    while (m.find()) n += 1
    n
  }

  test("normalizeText == lower + strip + collapse + trim (java regex)") {
    (1L to 400L).foreach { trial =>
      val t = randomText(trial)
      // reference: Spark lower() is UTF8String.toLowerCase
      val low = UTF8String.fromString(t).toLowerCase.toString
      val ref = low.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ")
      val refTrim = ref.replaceAll("^ +| +$", "")
      val got = Scrub.normalizeText(UTF8String.fromString(t)).toString
      assert(got == refTrim, s"trial $trial input=${t.take(80)}")
    }
  }

  test("piiStats == java-regex counts on raw + sequential replaceAll") {
    (1L to 400L).foreach { trial =>
      val t = randomText(trial)
      val row = Scrub.piiStats(UTF8String.fromString(t))
      val redRef = ipP.matcher(
        phoneP.matcher(
          emailP.matcher(t).replaceAll("<EMAIL>"))
          .replaceAll("<PHONE>"))
        .replaceAll("<IP>")
      assert(row.getLong(0) == countOf(emailP, t), s"emails, trial $trial: $t")
      assert(row.getLong(1) == countOf(phoneP, t), s"phones, trial $trial: $t")
      assert(row.getLong(2) == countOf(ipP, t), s"ips, trial $trial: $t")
      assert(row.getUTF8String(3).toString == redRef, s"mask, trial $trial: $t")
      // detect-then-redact contract: the early-exit probe is exactly
      // "any count > 0" — the filter xq36 runs scan-side.
      val any = row.getLong(0) + row.getLong(1) + row.getLong(2) > 0
      assert(Scrub.piiAny(UTF8String.fromString(t)) == any,
        s"probe, trial $trial: $t")
    }
  }
}
