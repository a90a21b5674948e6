package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → word-n-gram → 60-bit md5 hash, one codegen'd pass.
  *
  * Semantically identical to `Shingles.exploded` + `Md5Prefix60(prefix ||
  * shingle)` collected per doc — but the shingle STRINGS are never built.
  * `split(text, " ")` tokens re-joined with a single space reproduce the
  * exact byte span of the original text between the first token's start
  * and the last token's end, so each n-gram hash is md5 over a byte RANGE
  * of the input UTF8String: zero string concatenation, zero Generate
  * blow-up of ~30-byte keys, and consumers join/aggregate on longs.
  *
  * This was the shared dominant cost of the whole shingle family
  * (minhash/jaccard/containment/decontamination/repeated-spans/classifier
  * bigrams, the >2x tail of BENCH_r03): `transform(sequence)+slice+
  * array_join` allocated every n-gram as a string that was immediately
  * hashed and discarded. Same promotion rule as [[TokenFoldHash]] /
  * [[Md5Prefix60]] (SURVEY §4): measured hot loop → native expression.
  *
  * DuckDB twin: `CAST('0x' || substr(md5(prefix || shingle), 1, 15) AS
  * BIGINT)` over the list-CTE shingles — unchanged where it already
  * appears (minhash), and the jaccard-family oracles hash their string
  * shingles through the same idiom so engine behavior (collisions
  * included) is identical by construction.
  *
  * Output: `array<long>` — element i is the hash of the n-gram starting at
  * 0-based token position i (so `posexplode` recovers the positions the
  * span operators need); docs with fewer than n tokens yield an empty
  * array.
  */
case class ShingleHashes(child: Expression, n: Int, prefix: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"need n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got $t")
  }

  private lazy val prefixBytes = prefix.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], n, prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleHash.hashes($c, $n, $pref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Fused MinHash signature: `array<long>` of k values, element j-1 =
  * min over all word-n-grams of md5p60((j).toString || shingle) — the
  * whole `minhashSignatures` aggregation as ONE narrow projection: no
  * shingle explode, no per-doc groupBy exchange, one tokenization pass
  * and k digests per shingle (the k digests were always the floor).
  *
  * Docs with fewer than n tokens return NULL (the exploded+groupBy form
  * dropped them — callers filter `isNotNull`, preserving row semantics).
  */
case class ShingleMinHash(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"need n,k >= 1; got n=$n k=$k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.minhash(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ShingleHash.minhash($c, $n, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Fused SimHash signature: tokenize → md5p60(prefix || token) → bit-vote →
  * sign, one pass per doc, emitting the signature LONG directly. Replaces a
  * token explode (N_tok rows) + a 60× bit explode + two doc-keyed exchanges
  * with a narrow projection — the (doc, bit) vote aggregation was the
  * dominant cost of every simhash consumer at sf1 (xq07 14 s). The vote is
  * an order-free integer sum per bit, so the fused form is bit-identical to
  * the aggregation (and to the DuckDB oracle, which is unchanged).
  */
case class SimhashSig(child: Expression, prefix: String, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bits >= 1 && bits <= 60 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"need 1 <= bits <= 60, got $bits")
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs a string input, got $t")
  }

  private lazy val prefixBytes = prefix.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.simhash(input.asInstanceOf[UTF8String], prefixBytes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleHash.simhash($c, $pref, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object ShingleHash {

  /** Per-thread digest (stateful, not thread-safe) + output buffer.
    *
    * KEEP MessageDigest here: a hand-inlined RFC 1321 implementation with
    * a reusable per-thread context (one compression block per short input,
    * no provider dispatch) was tried in round 6 and REJECTED on
    * measurement — xq05 read 4.2 → 7.1 s at sf1, consistently across
    * runs. HotSpot intrinsifies `MD5.implCompress` to hardware-tuned
    * vector code; pure-JVM MD5 cannot beat it, so the k-digest minhash
    * loop is already at the JDK's floor and the remaining xq05 gap vs
    * DuckDB (~2x flat across three decades) is the cross-engine md5
    * constant, not call overhead.
    */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Single-digit-or-more decimal prefixes "1".."k" as UTF-8 bytes, cached
    * per k (k is a plan literal — a handful of distinct values per JVM).
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def seeds(k: Int): Array[Array[Byte]] =
    seedCache.computeIfAbsent(k,
      _ => Array.tabulate(k)(j => (j + 1).toString.getBytes("UTF-8")))

  /** Byte offsets of token starts for `split(text, " ")` semantics: token t
    * spans [starts(t), starts(t+1) - 1); sentinel starts(nToks) = nb + 1.
    * Space (0x20) never occurs inside a multi-byte UTF-8 sequence, so the
    * raw-byte scan is exact.
    */
  private def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 2)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(spaces + 1) = nb + 1
    starts
  }

  private def digestSpan(digest: MessageDigest, out: Array[Byte],
      prefix: Array[Byte], bytes: Array[Byte], from: Int, until: Int): Long = {
    digest.reset()
    if (prefix.length > 0) digest.update(prefix)
    digest.update(bytes, from, until - from)
    digest.digest(out, 0, 16)
    val top =
      ((out(0) & 0xFFL) << 56) | ((out(1) & 0xFFL) << 48) |
      ((out(2) & 0xFFL) << 40) | ((out(3) & 0xFFL) << 32) |
      ((out(4) & 0xFFL) << 24) | ((out(5) & 0xFFL) << 16) |
      ((out(6) & 0xFFL) << 8) | (out(7) & 0xFFL)
    top >>> 4
  }

  /** All n-gram hashes in token order (empty array if < n tokens). */
  def hashes(s: UTF8String, n: Int, prefix: Array[Byte]): ArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val nSh = nToks - n + 1
    if (nSh <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val digest = md.get()
    val out = buf.get()
    val res = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      res(i) = digestSpan(digest, out, prefix, bytes, starts(i), starts(i + n) - 1)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  /** k-seed MinHash mins over the n-gram hashes (null if < n tokens). */
  def minhash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val nSh = nToks - n + 1
    if (nSh <= 0) return null
    val pre = seeds(k)
    val digest = md.get()
    val out = buf.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val from = starts(i)
      val until = starts(i + n) - 1
      var j = 0
      while (j < k) {
        val h = digestSpan(digest, out, pre(j), bytes, from, until)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Bit-majority SimHash over md5p60(prefix || token) per whitespace
    * token: votes(b) += ±1 per token, bit set iff votes(b) > 0.
    */
  def simhash(s: UTF8String, prefix: Array[Byte], bits: Int): Long = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val digest = md.get()
    val out = buf.get()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < nToks) {
      val h = digestSpan(digest, out, prefix, bytes, starts(i), starts(i + 1) - 1)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object ShingleHashes {
  /** Column-level entry point. */
  def apply(c: Column, n: Int, prefix: String = ""): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n, prefix))
}

object ShingleMinHash {
  /** Column-level entry point. */
  def apply(c: Column, n: Int, k: Int): Column =
    ColumnBridge.column(ShingleMinHash(ColumnBridge.expression(c), n, k))
}

object SimhashSig {
  /** Column-level entry point. */
  def apply(c: Column, prefix: String = "", bits: Int = 60): Column =
    ColumnBridge.column(SimhashSig(ColumnBridge.expression(c), prefix, bits))
}
