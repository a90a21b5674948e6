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

/** Per-document term passes for the LM-scoring / term-ranking family:
  * adjacent-token bigrams and in-document top-k terms as native codegen'd
  * expressions.
  *
  * Same promotion rule as [[TextRules]] (SURVEY §4, measured hot loop →
  * native expression): the Column-program bigram form ran an interpreted
  * `transform(sequence(...))` struct builder per document (xq48's dominant
  * cost at sf1), and the top-terms form shuffled every (doc_id, term)
  * occurrence through an exchange + window for what is a per-document
  * computation — [[TopTerms]] makes xq23 map-only (zero exchanges before
  * the final presentation sort).
  *
  * Exactness contract: token spans are `split(s, " ")` semantics (Java
  * limit -1 — interior AND trailing empty tokens kept); top-k ordering is
  * (tf DESC, term ASC) with term compared as UTF8String binary order —
  * byte-identical to the row_number window the Column program ran. The
  * DuckDB oracles are unchanged.
  */
object TermStats {

  /** split(s, " ") spans → adjacent pairs; empty array when < 2 tokens
    * (explode then drops the document, matching `where(size >= 2)`).
    */
  def tokenBigrams(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // first pass: token span boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var from = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' ') {
        starts.add(from); ends.add(i); from = i + 1
      }
      i += 1
    }
    val n = starts.size()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](n - 1)
    var t = 0
    while (t < n - 1) {
      val w1 = UTF8String.fromBytes(bytes, starts.get(t), ends.get(t) - starts.get(t))
      val w2 = UTF8String.fromBytes(bytes, starts.get(t + 1), ends.get(t + 1) - starts.get(t + 1))
      out(t) = InternalRow(w1, w2)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** All term frequencies of split(s, " ") tokens in one pass, as a flat
    * [(term, tf, dl)] array — dl is the TOTAL token count (= Σ tf, the
    * BM25 document length), replicated into every entry so the whole
    * per-document term table is ONE expression feeding ONE generator: a
    * document is one row, so grouping by (doc_id, term) is a purely
    * row-local computation, and the single-reference shape means project
    * collapse can never duplicate the counting pass into a per-exploded-row
    * re-evaluation. Entry order is insertion order of first occurrence —
    * callers must treat the array as a set (every downstream use explodes
    * into an aggregate, join, or window, all order-insensitive).
    */
  def termCounts(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var dl = 0L
    var from = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, from, i - from)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
        dl += 1L
        from = i + 1
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.size())
    val it = counts.entrySet().iterator()
    var t = 0
    while (it.hasNext) {
      val e = it.next()
      out(t) = InternalRow(e.getKey, e.getValue()(0), dl)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Term frequencies of split(s, " ") tokens, top `k` by
    * (tf DESC, term binary ASC), as (term, tf, rk) structs with rk 1-based.
    */
  def topTerms(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var from = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, from, i - from)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
        from = i + 1
      }
      i += 1
    }
    val entries = new java.util.ArrayList[java.util.Map.Entry[UTF8String, Array[Long]]](
      counts.entrySet())
    entries.sort(new java.util.Comparator[java.util.Map.Entry[UTF8String, Array[Long]]] {
      override def compare(a: java.util.Map.Entry[UTF8String, Array[Long]],
          b: java.util.Map.Entry[UTF8String, Array[Long]]): Int = {
        val byTf = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
        if (byTf != 0) byTf else a.getKey.compareTo(b.getKey)
      }
    })
    val take = math.min(k, entries.size())
    val out = new Array[AnyRef](take)
    var r = 0
    while (r < take) {
      val e = entries.get(r)
      out(r) = InternalRow(e.getKey, e.getValue()(0), (r + 1).toLong)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Adjacent-token bigrams of a document in one codegen'd pass; see
  * [[TermStats]].
  */
case class TokenBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenBigrams.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_bigrams needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermStats.tokenBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TermStats.tokenBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}

object TokenBigrams {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false))), containsNull = false)

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(TokenBigrams(ColumnBridge.expression(c)))
}

/** Whole per-document term-frequency table + document length in one
  * codegen'd pass, shaped for a single `explode` — the exchange-free front
  * half of BM25/TF-IDF shapes; see [[TermStats.termCounts]].
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermCounts.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_counts needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermStats.termCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TermStats.termCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false))), containsNull = false)

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(c)))
}

/** In-document top-k terms by (tf DESC, term ASC) in one codegen'd pass —
  * no exchange, no window; see [[TermStats]].
  */
case class TopTerms(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = TopTerms.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"need k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_terms needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TermStats.topTerms(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TermStats.topTerms($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TopTerms =
    copy(child = newChild)
}

object TopTerms {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("rk", LongType, nullable = false))), containsNull = false)

  /** Column-level entry point. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(TopTerms(ColumnBridge.expression(c), k))
}
