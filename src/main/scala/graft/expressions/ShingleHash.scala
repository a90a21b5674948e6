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

/** Fused MinHash signature: `array<long>` of k values — the whole
  * `minhashSignatures` aggregation as ONE narrow projection: no shingle
  * explode, no per-doc groupBy exchange, one tokenization pass.
  *
  * The permutation family is TWO 60-bit windows per md5 digest (round 11):
  * digest j = md5((j).toString || shingle) supplies slot 2j-1 from hex
  * chars 1-15 (bits 127-68) and slot 2j from hex chars 17-31 (bits 63-4),
  * so k hash functions cost k/2 digests — the digests were always the
  * measured floor of the shingle family, and the windows are
  * non-overlapping bit ranges of a digest, the standard
  * one-hash-many-windows MinHash construction. The DuckDB twin applies
  * the identical `substr(d, 1, 15)` / `substr(d, 17, 15)` windows, so
  * signatures stay oracle-exact (k must be even).
  *
  * Docs with fewer than n tokens return NULL (the exploded+groupBy form
  * dropped them — callers filter `isNotNull`, preserving row semantics).
  */
case class ShingleMinHash(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && k >= 2 && k % 2 == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"need n >= 1 and even k >= 2 (two windows per digest); got n=$n k=$k")
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

  private def fillDigest(digest: MessageDigest, out: Array[Byte],
      prefix: Array[Byte], bytes: Array[Byte], from: Int, until: Int): Unit = {
    digest.reset()
    if (prefix.length > 0) digest.update(prefix)
    digest.update(bytes, from, until - from)
    digest.digest(out, 0, 16)
  }

  /** 60-bit window starting at byte `o` of a digest: 8 big-endian bytes
    * right-shifted a nibble — byte windows 0 and 8 are exactly the SQL
    * idioms `substr(md5_hex, 1, 15)` and `substr(md5_hex, 17, 15)`.
    */
  private def window60(out: Array[Byte], o: Int): Long = {
    val v =
      ((out(o) & 0xFFL) << 56) | ((out(o + 1) & 0xFFL) << 48) |
      ((out(o + 2) & 0xFFL) << 40) | ((out(o + 3) & 0xFFL) << 32) |
      ((out(o + 4) & 0xFFL) << 24) | ((out(o + 5) & 0xFFL) << 16) |
      ((out(o + 6) & 0xFFL) << 8) | (out(o + 7) & 0xFFL)
    v >>> 4
  }

  private def digestSpan(digest: MessageDigest, out: Array[Byte],
      prefix: Array[Byte], bytes: Array[Byte], from: Int, until: Int): Long = {
    fillDigest(digest, out, prefix, bytes, from, until)
    window60(out, 0)
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

  /** k-slot MinHash mins over the n-gram hashes — k/2 digests, two 60-bit
    * windows each (null if < n tokens; k even, checked by the expression).
    */
  def minhash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val nSh = nToks - n + 1
    if (nSh <= 0) return null
    val nSeeds = k / 2
    val pre = seeds(nSeeds)
    val digest = md.get()
    val out = buf.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val from = starts(i)
      val until = starts(i + n) - 1
      var j = 0
      while (j < nSeeds) {
        fillDigest(digest, out, pre(j), bytes, from, until)
        val hi = window60(out, 0)
        val lo = window60(out, 8)
        if (hi < mins(2 * j)) mins(2 * j) = hi
        if (lo < mins(2 * j + 1)) mins(2 * j + 1) = lo
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
