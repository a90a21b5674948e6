package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass corpus-scrubbing kernels: text normalization (xq20) and PII
  * count+redact (xq36, behind Redaction.redact) as native codegen'd
  * expressions.
  *
  * Both queries were regexp_replace chains over the FULL document text —
  * java.util.regex re-scanning every byte once per pattern (two passes for
  * normalize, six for redaction: three counts + three masks). Measured at
  * sf5 (1.1 GB of text): xq20 30.5 s, xq36 29.3 s in the round-11 full
  * batch, against 2.7 s / 0.7 s for DuckDB's RE2 — the two slowest
  * scan-shaped rows in the suite for what is byte-loop work. Same
  * promotion rule as [[TextRules]] (SURVEY §4): measured hot loop →
  * native expression; the DuckDB oracles are unchanged.
  *
  * Exactness contract (spec-pinned against the Column-program forms):
  *
  * `normalizeText` ==
  * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", ""), " +", " "))`
  * — Unicode lowercasing first (a non-ASCII char may lower INTO ASCII,
  * e.g. U+212A → 'k', so the non-ASCII fallback lowers via
  * UTF8String.toLowerCase before filtering), strip everything outside
  * [a-z0-9 ], collapse runs of the surviving spaces, trim. Only a ' '
  * that survives the strip separates words — removed punctuation does
  * NOT become whitespace, exactly like the regex pipeline.
  *
  * `piiStats` == Redaction's regex semantics: per-pattern counts on the
  * RAW text (leftmost non-overlapping java-regex matches) and masking
  * applied email → phone → IP sequentially, each pass on the PREVIOUS
  * pass's output. The hand automata reproduce java.util.regex on the
  * three patterns exactly, including greedy-with-backtrack domain
  * matching (`[A-Za-z0-9.-]+\.[A-Za-z]{2,}` = the rightmost '.' in the
  * maximal domain run that is followed by ≥2 letters) and ASCII `\b`
  * word boundaries. All pattern chars are ASCII, so UTF-8 continuation
  * bytes can never join a match and are non-word for `\b` — the byte
  * automaton is exact on any Unicode input.
  */
object Scrub {

  /** One-pass normalize; see the exactness contract above. */
  def normalizeText(s: UTF8String): UTF8String = {
    val raw = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < raw.length) {
      if ((raw(i) & 0x80) != 0) ascii = false
      i += 1
    }
    // Non-ASCII: Unicode-lower the whole string first (rare path); its
    // output contains no A-Z, so the filter loop below needs no casing.
    val src = if (ascii) raw else s.toLowerCase.getBytes
    val out = new Array[Byte](src.length)
    var o = 0
    var pending = false
    i = 0
    while (i < src.length) {
      var b = src(i)
      if (ascii && b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        pending = false
        out(o) = b
        o += 1
      } else if (b == ' ') pending = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  // --- PII automata ----------------------------------------------------

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  /** ASCII word chars ([A-Za-z0-9_]) — the `\w` class. */
  private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'

  /** java.util.regex Bound quirk (found by ScrubPropertySpec): without
    * UNICODE_CHARACTER_CLASS, `\w` is ASCII but `\b` classifies word
    * chars as `'_' || Character.isLetterOrDigit(codepoint)` — Unicode
    * letters DO block a boundary (Pattern$Bound.isWord). 'é' after a
    * phone number kills the java/Spark match; the boundary checks decode
    * the full codepoint to reproduce that. (DuckDB's RE2 `\b` is ASCII —
    * a pre-existing cross-engine divergence the corpus never exercises:
    * injected PII always has ASCII neighbors.)
    */
  private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Decode the UTF-8 codepoint starting at `s` (malformed → U+FFFD). */
  private def codePointAt(b: Array[Byte], s: Int): Int = {
    val n = b.length
    val c = b(s) & 0xFF
    if (c < 0x80) c
    else if ((c & 0xE0) == 0xC0 && s + 1 < n)
      ((c & 0x1F) << 6) | (b(s + 1) & 0x3F)
    else if ((c & 0xF0) == 0xE0 && s + 2 < n)
      ((c & 0x0F) << 12) | ((b(s + 1) & 0x3F) << 6) | (b(s + 2) & 0x3F)
    else if ((c & 0xF8) == 0xF0 && s + 3 < n)
      ((c & 0x07) << 18) | ((b(s + 1) & 0x3F) << 12) |
        ((b(s + 2) & 0x3F) << 6) | (b(s + 3) & 0x3F)
    else 0xFFFD
  }

  /** Is the codepoint ENDING at `i` a `\b` word char? */
  private def wordBefore(b: Array[Byte], i: Int): Boolean = {
    if (i <= 0) return false
    if ((b(i - 1) & 0x80) == 0) return isWord(b(i - 1))
    var s = i - 1
    while (s > 0 && (b(s) & 0xC0) == 0x80) s -= 1
    isWordCp(codePointAt(b, s))
  }

  /** Is the codepoint STARTING at `j` a `\b` word char? */
  private def wordAt(b: Array[Byte], j: Int): Boolean = {
    if (j >= b.length) return false
    if ((b(j) & 0x80) == 0) return isWord(b(j))
    isWordCp(codePointAt(b, j))
  }
  /** Email local-part chars. */
  private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  /** Email domain-run chars. */
  private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  private val EmailMask = "<EMAIL>".getBytes("UTF-8")
  private val PhoneMask = "<PHONE>".getBytes("UTF-8")
  private val IpMask = "<IP>".getBytes("UTF-8")

  /** Growable byte sink for the masking passes (null = count only). */
  private final class Sink(cap: Int) {
    var buf = new Array[Byte](cap)
    var len = 0
    def append(src: Array[Byte], from: Int, until: Int): Unit = {
      val n = until - from
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
      System.arraycopy(src, from, buf, len, n)
      len += n
    }
    def append(mask: Array[Byte]): Unit = append(mask, 0, mask.length)
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Leftmost non-overlapping email matches; returns the count, appends
    * the masked text to `out` when non-null.
    *
    * Match = maximal local-part run, '@', then the backtracked domain:
    * within the maximal [A-Za-z0-9.-] run after '@', the RIGHTMOST '.'
    * preceded by ≥1 run char and followed by ≥2 letters; the match ends
    * after that maximal letter run (java regex leaves the rest of the
    * domain run unconsumed, e.g. "a@b.co7" matches "a@b.co").
    */
  private def emailPass(b: Array[Byte], out: Sink,
      max: Long = Long.MaxValue): Long = {
    val n = b.length
    var count = 0L
    var lastEnd = 0
    var emit = 0
    var i = 0
    while (i < n) {
      if (b(i) == '@') {
        var s = i
        while (s > lastEnd && isLocal(b(s - 1))) s -= 1
        if (s < i) {
          var e = i + 1
          while (e < n && isDomain(b(e))) e += 1
          // rightmost valid '.'; needs one domain char before it
          var matchEnd = -1
          var p = e - 2
          while (matchEnd < 0 && p >= i + 2) {
            if (b(p) == '.') {
              var a = p + 1
              while (a < e && isAlpha(b(a))) a += 1
              if (a - (p + 1) >= 2) matchEnd = a
            }
            p -= 1
          }
          if (matchEnd > 0) {
            count += 1
            if (out == null && count >= max) return count
            if (out != null) {
              out.append(b, emit, s)
              out.append(EmailMask)
              emit = matchEnd
            }
            lastEnd = matchEnd
            i = matchEnd - 1 // loop increment lands on matchEnd
          }
        }
      }
      i += 1
    }
    if (out != null) out.append(b, emit, n)
    count
  }

  /** `\b\d{3}-\d{3}-\d{4}\b` — fixed 12-byte shape with word boundaries. */
  private def phonePass(b: Array[Byte], out: Sink,
      max: Long = Long.MaxValue): Long = {
    val n = b.length
    var count = 0L
    var emit = 0
    var i = 0
    while (i + 12 <= n) {
      if (isDigit(b(i)) && !wordBefore(b, i) &&
          isDigit(b(i + 1)) && isDigit(b(i + 2)) && b(i + 3) == '-' &&
          isDigit(b(i + 4)) && isDigit(b(i + 5)) && isDigit(b(i + 6)) &&
          b(i + 7) == '-' &&
          isDigit(b(i + 8)) && isDigit(b(i + 9)) && isDigit(b(i + 10)) &&
          isDigit(b(i + 11)) &&
          !wordAt(b, i + 12)) {
        count += 1
        if (out == null && count >= max) return count
        if (out != null) {
          out.append(b, emit, i)
          out.append(PhoneMask)
          emit = i + 12
        }
        i += 12
      } else i += 1
    }
    if (out != null) out.append(b, emit, n)
    count
  }

  /** `\b\d{1,3}(\.\d{1,3}){3}\b` — each group is a MAXIMAL digit run of
    * 1-3 (a longer run can never match: the backtracked shorter prefix is
    * followed by a digit, failing the '.' / `\b` that must come next).
    */
  private def ipPass(b: Array[Byte], out: Sink,
      max: Long = Long.MaxValue): Long = {
    val n = b.length
    var count = 0L
    var emit = 0
    var i = 0
    while (i < n) {
      var end = -1
      if (isDigit(b(i)) && !wordBefore(b, i)) {
        var j = i
        var group = 0
        var ok = true
        while (ok && group < 4) {
          var r = j
          while (r < n && isDigit(b(r))) r += 1
          if (r - j < 1 || r - j > 3) ok = false
          else if (group < 3) {
            if (r < n && b(r) == '.') j = r + 1 else ok = false
          } else if (!wordAt(b, r)) j = r
          else ok = false
          group += 1
        }
        if (ok) end = j
      }
      if (end > 0) {
        count += 1
        if (out == null && count >= max) return count
        if (out != null) {
          out.append(b, emit, i)
          out.append(IpMask)
          emit = end
        }
        i = end
      } else i += 1
    }
    if (out != null) out.append(b, emit, n)
    count
  }

  /** (n_emails, n_phones, n_ips, redacted): counts on the raw text,
    * masking email → phone → IP with each pass reading the previous
    * pass's output — byte-for-byte the Redaction regex pipeline.
    *
    * No-match fast path (round 12): most corpus rows carry no PII at
    * all, and a mask pass with zero matches appends exactly its input —
    * so when all three raw-text counts are zero the three sink copies
    * are skipped and the INPUT UTF8String is returned unchanged
    * (bit-identical by construction; the redaction pipeline is the
    * identity on PII-free text). Rows that do match still pay only the
    * passes that can change them: a later pattern's mask pass must run
    * once any earlier pass rewrote the text (masking can alter `\b`
    * context for the next pattern, e.g. "x@y.com555-867-5309" gains a
    * phone boundary after the email mask), but never otherwise.
    * Measured at sf5: 4.97 s -> 1.19 s (11 full-size copies per row
    * down to 3 count scans for the ~75% PII-free slice).
    */
  def piiStats(s: UTF8String): InternalRow = {
    val raw = s.getBytes
    val nEmails = emailPass(raw, null)
    val nPhones = phonePass(raw, null)
    val nIps = ipPass(raw, null)
    if (nEmails == 0L && nPhones == 0L && nIps == 0L)
      return InternalRow(0L, 0L, 0L, s)
    var cur = raw
    if (nEmails > 0) {
      val k = new Sink(cur.length + 16); emailPass(cur, k); cur = k.result()
    }
    if (nPhones > 0 || (cur ne raw)) {
      val k = new Sink(cur.length + 16); phonePass(cur, k); cur = k.result()
    }
    if (nIps > 0 || (cur ne raw)) {
      val k = new Sink(cur.length + 16); ipPass(cur, k); cur = k.result()
    }
    InternalRow(nEmails, nPhones, nIps, UTF8String.fromBytes(cur))
  }

  /** Does ANY of the three patterns match the raw text? Early-exits on
    * the first match of each automaton (max = 1), so a PII-bearing row
    * costs far less than a count pass and a clean row costs exactly the
    * three count scans with no sink work. By definition equivalent to
    * `n_emails + n_phones + n_ips > 0` on [[piiStats]]' counts — the
    * detect side of detect-then-redact (spec-pinned in ScrubSpec).
    */
  def piiAny(s: UTF8String): Boolean = {
    val raw = s.getBytes
    emailPass(raw, null, 1L) > 0 || phonePass(raw, null, 1L) > 0 ||
      ipPass(raw, null, 1L) > 0
  }
}

/** `trim(regexp_replace(regexp_replace(lower(t),"[^a-z0-9 ]","")," +"," "))`
  * as one codegen'd byte pass; see [[Scrub]].
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Scrub.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Scrub.normalizeText($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}

/** PII counts + sequential masking as one codegen'd pass; see [[Scrub]]. */
case class PiiStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_stats needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Scrub.piiStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Scrub.piiStats($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiStats =
    copy(child = newChild)
}

object PiiStats {
  val schema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(PiiStats(ColumnBridge.expression(c)))
}

/** Boolean "text contains any PII pattern" — the detect half of
  * detect-then-redact ([[Scrub.piiAny]]): a cheap early-exit scan that
  * Catalyst can push to the filter side, so the full count+mask struct
  * is only built for the rows that carry PII. Equivalent by definition
  * to `pii_stats(c).n_emails + n_phones + n_ips > 0`.
  */
case class PiiProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_probe needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Scrub.piiAny(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Scrub.piiAny($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiProbe =
    copy(child = newChild)
}

object PiiProbe {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(PiiProbe(ColumnBridge.expression(c)))
}
