package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k rows per GROUP as an aggregate — the grouped analogue of
  * `TakeOrderedAndProject`, and the scale posture for every "rank ≤ k per
  * key" query shape.
  *
  * A window (`row_number().over(partitionBy(key).orderBy(...))`) sorts the
  * ENTIRE input stream inside one exchange keyed by the group column: at
  * 100 TB the full stream rides the wire, and a hot key (Zipfian terms,
  * marker tokens) lands on one task — measured on xq44 at sf5, 8.2 s of an
  * 11 s query for 30 M rows over 1.3 k groups. As an aggregate with k-row
  * state, partial aggregation reduces each map task to ≤ k rows per group
  * BEFORE the exchange (volume k·groups·tasks, independent of input rows)
  * and hot keys are combined map-side like any other aggregate — the skew
  * never travels.
  *
  * Semantics: input rows are structs; the first `desc.length` fields are
  * the sort key (`desc(i)` = field i descending), compared exactly like a
  * `row_number` ORDER BY with binary string / IEEE double comparisons, and
  * the kept rows come back as an array in rank order (`posexplode` ⇒ rk =
  * pos + 1). The caller's key must be UNIQUE per row within a group (e.g.
  * include the row's id as a tiebreak field) — equal keys keep an
  * arbitrary-order subset, exactly as row_number would break the tie
  * nondeterministically. Sort-key fields must be NON-NULL, and callers
  * must guarantee it (wrap nullable keys in coalesce): nothing here
  * checks, and a null sort field reads as 0/false/"" through the
  * UnsafeRow getters — i.e. it silently ranks as that zero value rather
  * than NULLS FIRST/LAST. Every engine call site feeds counts, hashes,
  * or ids, which are non-null by construction.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    desc: Seq[Boolean],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top_k_rows needs k >= 1, got $k")

  private lazy val structType: StructType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if desc.nonEmpty && desc.length <= s.length =>
        val bad = s.fields.take(desc.length).filterNot(f => f.dataType match {
          case DoubleType | FloatType | LongType | IntegerType | ShortType |
               ByteType | StringType | BooleanType | DateType | TimestampType => true
          case _ => false
        })
        if (bad.isEmpty)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_rows sort fields must be atomic orderable types, got " +
            bad.map(_.dataType).mkString(", "))
      case s: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_rows needs 1 <= desc.length <= ${s.length} sort fields, " +
            s"got ${desc.length}")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_rows needs a struct input, got $t")
    }

  /** Rank order: cmp(a, b) < 0 ⇔ a ranks strictly before b. */
  private lazy val rankCmp: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] {
      private val fields = structType.fields
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < desc.length) {
          val c = fields(i).dataType match {
            case DoubleType => java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
            case FloatType => java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
            case LongType | TimestampType => java.lang.Long.compare(a.getLong(i), b.getLong(i))
            case IntegerType | DateType => Integer.compare(a.getInt(i), b.getInt(i))
            case ShortType => java.lang.Short.compare(a.getShort(i), b.getShort(i))
            case ByteType => java.lang.Byte.compare(a.getByte(i), b.getByte(i))
            case BooleanType => java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
            case StringType => a.getUTF8String(i).compareTo(b.getUTF8String(i))
            case t => throw new IllegalStateException(s"unorderable sort field: $t")
          }
          if (c != 0) return if (desc(i)) -c else c
          i += 1
        }
        0
      }
    }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = true

  /** Max-heap on rank order: head = WORST kept row, evicted on overflow. */
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, rankCmp.reversed())

  /** Codegen'd flat projection of the struct's field expressions with a
    * REUSED output buffer: the per-input-row hot path is one projection
    * write + one primitive comparison against the heap head — no
    * allocation, no boxing. Rows are copied only on admission (≤ k net
    * admissions per group per task once the buffer fills).
    */
  private lazy val inputProj: UnsafeProjection = UnsafeProjection.create(
    child match {
      case c: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
        c.valExprs
      case e =>
        structType.indices.map(i =>
          org.apache.spark.sql.catalyst.expressions.GetStructField(e, i))
    })

  override def update(buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val row = inputProj(input)
    // admit only rows that beat the current worst once the buffer is full
    if (buf.size() < k || rankCmp.compare(row, buf.peek()) < 0) {
      buf.add(row.copy())
      if (buf.size() > k) buf.poll()
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buf.size() < k || rankCmp.compare(row, buf.peek()) < 0) {
        buf.add(row)
        if (buf.size() > k) buf.poll()
      }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[AnyRef](buf.size())
    buf.toArray(arr.asInstanceOf[Array[Object]])
    java.util.Arrays.sort(arr, rankCmp.asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      // buffer rows are always UnsafeRow (inputProj copies or deserialize)
      val u = it.next().asInstanceOf[UnsafeRow]
      dos.writeInt(u.getSizeInBytes)
      u.writeToStream(dos, null)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val u = new UnsafeRow(structType.length)
      u.pointTo(rowBytes, len)
      buf.add(u)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)
  override def prettyName: String = "top_k_rows"
}

object TopKRows {

  /** Column-level entry point: `groupBy(key).agg(TopKRows(struct(...), k,
    * desc))` — the struct's first `desc.length` fields are the sort key.
    */
  def apply(c: Column, k: Int, desc: Seq[Boolean]): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(c), k, desc).toAggregateExpression())
}
