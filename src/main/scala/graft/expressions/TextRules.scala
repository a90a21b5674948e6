package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text statistics for the rule-based cleaning family
  * (Cleaning.scala): the Gopher document stats and the C4 line filter as
  * native codegen'd expressions.
  *
  * The Column-program forms of these rules run `filter`/`aggregate`
  * higher-order functions over `split` arrays — HOFs are interpreted
  * (CodegenFallback lambdas), the arrays materialize every token/line as a
  * UTF8String, and the per-word `rlike` compiles a regex Matcher per
  * element. At sf1 that made xq64/xq65 the two most expensive scan-shaped
  * queries in the suite (17.6 s / 13.9 s) for what is one arithmetic pass
  * over bytes. Same promotion rule as [[ShingleHashes]] / [[TokenFoldHash]]
  * (SURVEY §4): measured hot loop → native expression.
  *
  * Exactness contract: both expressions reproduce the Column-program
  * semantics byte-for-byte — `split(s, sep)` token/line spans WITH empty
  * tokens and the trailing empty element, character (not byte) lengths,
  * leftmost non-overlapping "..." matches, and Unicode lowercasing via
  * UTF8String.toLowerCase on the (rare) non-ASCII spans so the ASCII fast
  * path never changes a verdict. The DuckDB oracles are unchanged.
  */
object TextRules {

  /** The eight Gopher stop words as UTF-8 byte arrays (all ASCII). */
  private[expressions] val stopBytes: Array[Array[Byte]] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.getBytes("UTF-8"))
  private val stopU: Array[UTF8String] =
    stopBytes.map(UTF8String.fromBytes)

  /** Chars in bytes[from, until): count non-continuation bytes. */
  private def numChars(bytes: Array[Byte], from: Int, until: Int): Int = {
    var n = 0
    var i = from
    while (i < until) { if ((bytes(i) & 0xC0) != 0x80) n += 1; i += 1 }
    n
  }

  private def isAscii(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if ((bytes(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  /** lower(word) == some stop word. ASCII fast path; exact fallback via
    * UTF8String.toLowerCase for spans with non-ASCII bytes (Unicode
    * special lowercasings like U+212A can land on ASCII letters).
    */
  private def isStopword(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    val len = until - from
    if (len < 2 || len > 4) {
      if (isAscii(bytes, from, until)) return false
    }
    if (isAscii(bytes, from, until)) {
      var s = 0
      while (s < stopBytes.length) {
        val sw = stopBytes(s)
        if (sw.length == len) {
          var i = 0
          var ok = true
          while (ok && i < len) {
            val c = bytes(from + i)
            val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
            if (lc != sw(i)) ok = false
            i += 1
          }
          if (ok) return true
        }
        s += 1
      }
      false
    } else {
      val low = UTF8String.fromBytes(bytes, from, len).toLowerCase
      var s = 0
      while (s < stopU.length) {
        if (low.equals(stopU(s))) return true
        s += 1
      }
      false
    }
  }

  /** One pass over the document; field order matches [[GopherStats.dataType]]. */
  def gopherStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val nb = bytes.length

    var nWords = 1L
    var sumWordLen = 0L
    var nHash = 0L
    var nEllipsis = 0L
    var nLines = 1L
    var nBullet = 0L
    var nEllLine = 0L
    var nAlpha = 0L
    var nStop = 0L

    // words: spans split on ' ' OR '\n' (regexp_replace(t,"\n"," ") + split)
    var wordFrom = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' ' || bytes(i) == '\n') {
        sumWordLen += numChars(bytes, wordFrom, i)
        var j = wordFrom
        var alpha = false
        while (!alpha && j < i) {
          val c = bytes(j)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1
        if (isStopword(bytes, wordFrom, i)) nStop += 1
        if (i < nb) nWords += 1
        wordFrom = i + 1
      }
      i += 1
    }

    // '#' count and leftmost non-overlapping "..." count over the raw text
    i = 0
    while (i < nb) {
      if (bytes(i) == '#') nHash += 1
      if (bytes(i) == '.' && i + 2 < nb &&
          bytes(i + 1) == '.' && bytes(i + 2) == '.') {
        nEllipsis += 1
        i += 2 // skip the matched span (loop adds 1)
      }
      i += 1
    }

    // lines: spans split on '\n'
    var lineFrom = 0
    i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == '\n') {
        val len = i - lineFrom
        if (len >= 2 && bytes(lineFrom) == '-' && bytes(lineFrom + 1) == ' ')
          nBullet += 1
        else if (len >= 4 && bytes(lineFrom) == 0xE2.toByte &&
            bytes(lineFrom + 1) == 0x80.toByte &&
            bytes(lineFrom + 2) == 0xA2.toByte && bytes(lineFrom + 3) == ' ')
          nBullet += 1
        if (len >= 3 && bytes(i - 1) == '.' && bytes(i - 2) == '.' &&
            bytes(i - 3) == '.')
          nEllLine += 1
        if (i < nb) nLines += 1
        lineFrom = i + 1
      }
      i += 1
    }

    InternalRow(nWords, sumWordLen, nHash, nEllipsis, nLines, nBullet,
      nEllLine, nAlpha, nStop)
  }

  /** ASCII-lowercased `needle` contained in line span (case-insensitive on
    * ASCII letters); caller guarantees the span is all-ASCII.
    */
  private def containsAsciiLower(bytes: Array[Byte], from: Int, until: Int,
      needle: Array[Byte]): Boolean = {
    val n = needle.length
    if (n == 0) return true
    var i = from
    val last = until - n
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        val c = bytes(i + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        if (lc != needle(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** C4 keep-line verdict + kept-line collection, one pass per document.
    * Returns (n_lines, kept lines in order).
    */
  def c4Lines(s: UTF8String, minWords: Int,
      blocklist: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    val nb = bytes.length
    val kept = new java.util.ArrayList[AnyRef]()
    var nLines = 0L
    var lineFrom = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == '\n') {
        nLines += 1
        val until = i
        var keep = until > lineFrom
        if (keep) { // terminal punctuation: last byte (ASCII never mid-char)
          val lb = bytes(until - 1)
          keep = lb == '.' || lb == '!' || lb == '?' || lb == '"'
        }
        if (keep) { // word count: spaces + 1
          var spaces = 0
          var j = lineFrom
          while (j < until) { if (bytes(j) == ' ') spaces += 1; j += 1 }
          keep = spaces + 1 >= minWords
        }
        if (keep) { // no '{'
          var j = lineFrom
          while (keep && j < until) { if (bytes(j) == '{') keep = false; j += 1 }
        }
        if (keep && blocklist.length > 0) { // no boilerplate phrase
          if (isAscii(bytes, lineFrom, until)) {
            var p = 0
            while (keep && p < blocklist.length) {
              if (containsAsciiLower(bytes, lineFrom, until, blocklist(p)))
                keep = false
              p += 1
            }
          } else {
            val low = UTF8String.fromBytes(bytes, lineFrom, until - lineFrom)
              .toLowerCase
            var p = 0
            while (keep && p < blocklist.length) {
              if (low.contains(UTF8String.fromBytes(blocklist(p)))) keep = false
              p += 1
            }
          }
        }
        if (keep)
          kept.add(UTF8String.fromBytes(bytes, lineFrom, until - lineFrom))
        lineFrom = i + 1
      }
      i += 1
    }
    InternalRow(nLines, new GenericArrayData(kept.toArray))
  }

  /** Renderer behind [[LinedTextExpr]]; split/slice/array_join/when
    * semantics of the Column-program form, one pass.
    */
  def linedText(text: UTF8String, docId: Long): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val nChunks = math.ceil(toks.length / 8.0).toInt
    val sb = new java.lang.StringBuilder(text.numBytes + 4 * nChunks + 64)
    if (docId % 3 == 0)
      sb.append("please enable javascript and accept our cookie policy.\n")
    var i = 0
    while (i < nChunks) {
      val from = i * 8
      val until = math.min(from + 8, toks.length)
      val m = (docId * 31 + i) % 5
      if (m == 3) sb.append("- ")
      var t = from
      while (t < until) {
        if (t > from) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      if (m == 0 || m == 3) sb.append('.')
      else if (m == 1) sb.append('!')
      else if (m != 2) sb.append("...") // m==4 and the (unused) negative-id residues
      if (i < nChunks - 1) sb.append('\n')
      i += 1
    }
    if (docId % 7 == 0) sb.append("\nfunction f() { return 0; }")
    UTF8String.fromString(sb.toString)
  }
}

/** Deterministic multi-line rendering of a single-line document — the
  * corpus fixture both cleaning queries (xq64/xq65) run on: 8-token chunks
  * become lines with a suffix cycling on (doc_id·31+i) mod 5, plus an
  * injected boilerplate line (doc_id%3==0) and a code-brace line
  * (doc_id%7==0). Byte-identical to the Column-program form in
  * ExtensionQueries.linedText (split/slice/array_join/when over
  * `transform(sequence(...))`), whose interpreted HOF evaluation was the
  * actual dominant cost of both queries at sf1 — the rendering ran per
  * chunk through a per-element Column interpreter. DuckDB twin (linedCte)
  * unchanged.
  */
case class LinedTextExpr(text: Expression, docId: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = text
  override def right: Expression = docId

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, docId.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (t, d) => TypeCheckResult.TypeCheckFailure(
        s"lined_text needs (string, long), got ($t, $d)")
    }

  override protected def nullSafeEval(t: Any, id: Any): Any =
    TextRules.linedText(t.asInstanceOf[UTF8String], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, id) =>
      s"graft.expressions.TextRules.linedText($t, $id)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LinedTextExpr =
    copy(text = newLeft, docId = newRight)
}

object LinedTextExpr {
  /** Column-level entry point. */
  def apply(text: Column, docId: Column): Column =
    ColumnBridge.column(LinedTextExpr(
      ColumnBridge.expression(text), ColumnBridge.expression(docId)))
}

/** Gopher document statistics as one codegen'd pass; see [[TextRules]]. */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextRules.gopherStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextRules.gopherStats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ell_line", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(c)))
}

/** C4 line filter as one codegen'd pass; see [[TextRules]]. */
case class C4LineStats(child: Expression, minWords: Int,
    blocklist: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = C4LineStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if minWords >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"need minWords >= 1, got $minWords")
    case t => TypeCheckResult.TypeCheckFailure(
      s"c4_lines needs a string input, got $t")
  }

  private lazy val blockBytes: Array[Array[Byte]] =
    blocklist.map(_.toLowerCase.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextRules.c4Lines(input.asInstanceOf[UTF8String], minWords, blockBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bl = ctx.addReferenceObj("blocklist", blockBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextRules.c4Lines($c, $minWords, $bl)")
  }

  override protected def withNewChildInternal(newChild: Expression): C4LineStats =
    copy(child = newChild)
}

object C4LineStats {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("kept", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** Column-level entry point. */
  def apply(c: Column, minWords: Int, blocklist: Seq[String]): Column =
    ColumnBridge.column(
      C4LineStats(ColumnBridge.expression(c), minWords, blocklist))
}
