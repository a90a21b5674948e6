package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash: the repo's portable-hash idiom
  * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` as ONE codegen'd
  * expression — bit-identical output, none of the intermediate
  * materialization. The stock pipeline allocates a 32-char hex string
  * (md5), a 15-char substring, and runs `conv`'s arbitrary-base string
  * parser per row; this computes the same value straight from the digest
  * bytes: big-endian u64 of digest[0..7] >>> 4.
  *
  * DuckDB twin (unchanged everywhere it already appears):
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * Shorter prefixes of the same idiom derive by shift, so one expression
  * covers the whole family:
  *   - 4 hex chars  (16 bits): `shiftright(graft_md5p60(x), 44)`
  *   - 12 hex chars (48 bits): `shiftright(graft_md5p60(x), 12)`
  *
  * Same promotion rule as TokenFoldHash (SURVEY §4): measured hot loop →
  * native expression. This is the round-3 fix for the md5-bound bench tail
  * (xq05/xq42/pq13/xq75-class queries, 7-9x DuckDB in BENCH_r02).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5p60 needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** Both non-overlapping 60-bit windows of one md5 digest as `array<long>`:
  * element 0 = hex chars 1-15 (identical to [[Md5Prefix60]]), element 1 =
  * hex chars 17-31 — the round-11 one-hash-two-windows construction
  * ([[ShingleMinHash]]'s permutation family) exposed as a registry
  * function, for call sites that need two independent hashes of the same
  * key (Bloom probes): one digest where two `graft_md5p60` calls paid two.
  *
  * DuckDB twin, with the digest materialized once in a subquery:
  * `CAST('0x' || substr(d, 1, 15) AS BIGINT)` /
  * `CAST('0x' || substr(d, 17, 15) AS BIGINT)` over `d = md5(x)`.
  */
case class Md5Windows60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5w60 needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.windows(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Prefix60.windows($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Windows60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  /** Per-thread digest instance — MessageDigest is stateful and not
    * thread-safe; getInstance per row would dominate the hash itself.
    */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) as an unsigned 60-bit long. */
  def hash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val top =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    top >>> 4
  }

  /** Both 60-bit windows (hex 1-15 and 17-31) of md5(s), one digest call. */
  def windows(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    def w(o: Int): Long = {
      val v =
        ((d(o) & 0xFFL) << 56) | ((d(o + 1) & 0xFFL) << 48) |
        ((d(o + 2) & 0xFFL) << 40) | ((d(o + 3) & 0xFFL) << 32) |
        ((d(o + 4) & 0xFFL) << 24) | ((d(o + 5) & 0xFFL) << 16) |
        ((d(o + 6) & 0xFFL) << 8) | (d(o + 7) & 0xFFL)
      v >>> 4
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(w(0), w(8)))
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c)))
}

object Md5Windows60 {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Windows60(ColumnBridge.expression(c)))
}
