package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial document fingerprint:
  * h = fold over whitespace tokens of (h*31 + (charlen(tok)*131 +
  * codepoint(tok[0]))) mod 1e9+7 — one pass over the raw UTF-8 bytes,
  * no explode, no join, no per-element lambda interpretation.
  *
  * Replaces the posexplode + broadcast-powers-join + group plan of the
  * first fingerprintBulk (worst compute ratio in BENCH_r01, 73x DuckDB:
  * it paid a Generate, a join and an aggregate exchange per token). Same
  * promotion rule as VectorDot: measured hot loop → codegen'd expression
  * (SURVEY §4).
  *
  * Token semantics match `split(text, " ")` exactly (Java split with
  * limit -1): every single-space boundary splits, adjacent/leading/
  * trailing spaces produce empty tokens with value 0 (charlen 0,
  * `ascii('') = 0`). Value semantics match `length(tok)` (char count,
  * not bytes) and `ascii(tok)` (full first codepoint, surrogate pairs
  * included). Identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0, list_transform(string_split(text,' '),
  * t -> length(t)*131 + unicode(substr(t,1,1)))), (acc,v) -> (acc*31+v) %
  * 1000000007)` — all arithmetic is exact 64-bit integer, no FP drift.
  */
case class TokenFoldHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_fold_hash needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenFoldHash.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenFoldHash.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFoldHash =
    copy(child = newChild)
}

object TokenFoldHash {
  val Mod = 1000000007L

  /** One-pass fold over the UTF-8 bytes. Space (0x20) never occurs inside a
    * multi-byte UTF-8 sequence, so splitting on the raw byte is exact.
    */
  def fold(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        acc = (acc * 31L + tokenValue(s, tokStart, i)) % Mod
        tokStart = i + 1
      }
      i += 1
    }
    acc
  }

  /** charlen*131 + first codepoint for the byte span [start, end). */
  private def tokenValue(s: UTF8String, start: Int, end: Int): Long = {
    if (start >= end) return 0L
    var chars = 0L
    var i = start
    while (i < end) {
      if ((s.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    val b0 = s.getByte(start) & 0xFF
    val cp: Long =
      if (b0 < 0x80) b0
      else if (b0 < 0xE0)
        ((b0 & 0x1F) << 6) | (s.getByte(start + 1) & 0x3F)
      else if (b0 < 0xF0)
        ((b0 & 0x0F) << 12) | ((s.getByte(start + 1) & 0x3F) << 6) |
          (s.getByte(start + 2) & 0x3F)
      else
        ((b0 & 0x07) << 18) | ((s.getByte(start + 1) & 0x3F) << 12) |
          ((s.getByte(start + 2) & 0x3F) << 6) | (s.getByte(start + 3) & 0x3F)
    chars * 131L + cp
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(TokenFoldHash(ColumnBridge.expression(c)))
}
