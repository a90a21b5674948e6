package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Argmin-squared-L2 codebook assignment as ONE native expression — the L2
  * twin of [[BestCentroid]] (argmax-cosine), keyed by a `sub`(space) column
  * so ONE node serves every subspace of a product-quantization codebook.
  *
  * Replaces the explode → broadcast-join codebook → `groupBy(id, sub)
  * .min_by(cluster, struct(d2, cluster))` shape in `Similarity.pqEncode`
  * and `kmeansFitL2Grouped`'s per-round assignment: that form pays a k×
  * row blowup (every subvector duplicated per codebook centroid) plus a
  * hash aggregate KEYED BY THE VECTOR — the exact shape [[BestCentroid]]
  * deleted from the cosine path in r15 (measured there: composed/join
  * forms 10-20× worse than one native node). A per-sub literal CASE chain
  * was tried in r13 and rejected — m·k literal `l2d2` trees defeat codegen
  * — but that verdict applied to m·k EXPRESSION TREES, not to one node
  * carrying the codebooks as reference objects (m·k·subDim doubles —
  * metadata, the same driver-bounded state the broadcast shipped).
  *
  * Semantics are exactly the join form's, bit-for-bit:
  *   d2 = (dot(v, v) − 2.0·dot(v, c)) + dot(c, c)
  * with every dot a strict left-to-right double fold ([[VectorDot]]'s
  * contract, which is also the DuckDB oracle's `list_inner_product`);
  * dot(c, c) is precomputed driver-side with the same fold, so the double
  * is the identical bit pattern. The winner is min d2 with SMALLEST
  * cluster id on ties, under `java.lang.Double.compare` total order (NaN
  * greatest) — precisely `min_by(cluster, struct(d2, cluster))`.
  *
  * Row-drop parity: the join form emits NOTHING for a `sub` with no
  * codebook rows (inner join) and skips length-mismatched centroids
  * (VectorDot yields null there, and a null never wins a `min_by` struct
  * ordering against a real d2). Here an unknown `sub`, an all-mismatched
  * codebook, a null `sub`/vector, or a null element returns null —
  * callers filter `isNotNull` to reproduce the inner-join drop.
  *
  * Returns struct(cluster LONG, d2 DOUBLE).
  */
case class BestCentroidL2(left: Expression, right: Expression,
    subs: IndexedSeq[Int],
    cids: IndexedSeq[IndexedSeq[Long]],
    cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends BinaryExpression {
  require(subs.nonEmpty && subs.length == cids.length &&
    subs.length == cents.length &&
    cids.indices.forall(i => cids(i).nonEmpty && cids(i).length == cents(i).length),
    "BestCentroidL2 needs >= 1 sub group, each with >= 1 (cid, centroid) pair")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      // same fixed-width whitelist as BestCentroid: DecimalType is a
      // NumericType without a fixed-width ArrayData getter — reject at
      // analysis time, not as a runtime IllegalStateException
      case (IntegerType, ArrayType(ByteType | ShortType | IntegerType |
                                   LongType | FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"best_centroid_l2 needs (int sub, array of a fixed-width numeric " +
            s"type), got ($l, $r)")
    }

  private def elemType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val subArr: Array[Int] = subs.toArray
  @transient private lazy val cidArr: Array[Array[Long]] =
    cids.map(_.toArray).toArray
  @transient private lazy val centArr: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray
  // dot(c, c) with the strict left-to-right fold — bit-identical to the
  // join form's in-plan VectorDot(cvec, cvec)
  @transient private lazy val bbArr: Array[Array[Double]] =
    centArr.map(_.map { c =>
      var s = 0.0d; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  private def numAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(subIn: Any, vecIn: Any): Any = {
    val sub = subIn.asInstanceOf[Int]
    // m is tiny (PQ subspace count) — linear scan beats any map here
    var slot = -1
    var s = 0
    while (s < subArr.length && slot < 0) {
      if (subArr(s) == sub) slot = s
      s += 1
    }
    if (slot < 0) return null
    val v = vecIn.asInstanceOf[ArrayData]
    val n = v.numElements()
    val t = elemType
    var i = 0
    var aa = 0.0d
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = numAt(v, i, t); aa += x * x; i += 1
    }
    val cs = centArr(slot)
    val ids = cidArr(slot)
    val bbs = bbArr(slot)
    var bestD2 = Double.NaN
    var bestCid = Long.MaxValue
    var first = true
    var c = 0
    while (c < cs.length) {
      val cent = cs(c)
      if (cent.length == n) {
        var ab = 0.0d
        i = 0
        while (i < n) { ab += numAt(v, i, t) * cent(i); i += 1 }
        val d2 = (aa - 2.0d * ab) + bbs(c)
        val cmp = java.lang.Double.compare(d2, bestD2)
        if (first || cmp < 0 || (cmp == 0 && ids(c) < bestCid)) {
          bestD2 = d2; bestCid = ids(c); first = false
        }
      }
      c += 1
    }
    if (first) null else InternalRow(bestCid, bestD2)
  }

  private def genGet(arr: String, i: String): String = elemType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $elemType")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (subV, v) => {
      val subsRef = ctx.addReferenceObj("subs", subArr, "int[]")
      val centsRef = ctx.addReferenceObj("cents", centArr, "double[][][]")
      val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[][]")
      val bbsRef = ctx.addReferenceObj("bbs", bbArr, "double[][]")
      val slot = ctx.freshName("slot")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val aa = ctx.freshName("aa")
      val ab = ctx.freshName("ab")
      val d2 = ctx.freshName("d2")
      val cmp = ctx.freshName("cmp")
      val bestD2 = ctx.freshName("bestD2")
      val bestCid = ctx.freshName("bestCid")
      val first = ctx.freshName("first")
      val cent = ctx.freshName("cent")
      val grp = ctx.freshName("grp")
      val ids = ctx.freshName("ids")
      val bbg = ctx.freshName("bbg")
      s"""
         |int $slot = -1;
         |for (int $s = 0; $s < $subsRef.length && $slot < 0; $s++) {
         |  if ($subsRef[$s] == $subV) $slot = $s;
         |}
         |if ($slot < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $v.numElements();
         |  double $aa = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${genGet(v, i)};
         |    $aa += $x * $x;
         |  }
         |  if (!${ev.isNull}) {
         |    final double[][] $grp = $centsRef[$slot];
         |    final long[] $ids = $cidsRef[$slot];
         |    final double[] $bbg = $bbsRef[$slot];
         |    double $bestD2 = Double.NaN;
         |    long $bestCid = Long.MAX_VALUE;
         |    boolean $first = true;
         |    for (int $c = 0; $c < $grp.length; $c++) {
         |      final double[] $cent = $grp[$c];
         |      if ($cent.length != $n) continue;
         |      double $ab = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $ab += ${genGet(v, i)} * $cent[$i];
         |      }
         |      final double $d2 = ($aa - 2.0 * $ab) + $bbg[$c];
         |      final int $cmp = java.lang.Double.compare($d2, $bestD2);
         |      if ($first || $cmp < 0 || ($cmp == 0 && $ids[$c] < $bestCid)) {
         |        $bestD2 = $d2; $bestCid = $ids[$c]; $first = false;
         |      }
         |    }
         |    if ($first) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[] { $bestCid, $bestD2 });
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BestCentroidL2 =
    copy(left = l, right = r)
}

object BestCentroidL2 {
  /** Column-level entry point: per-sub codebooks, each a (cid, centroid)
    * list in any order. Sub groups and centroids are sorted here so the
    * expression is canonical (structural equality → exchange/codegen
    * reuse) regardless of caller iteration order.
    */
  def column(sub: Column, vec: Column,
      codebooks: Map[Int, Seq[(Long, Seq[Double])]]): Column = {
    val sorted = codebooks.toIndexedSeq.sortBy(_._1)
      .map { case (s, cs) => (s, cs.sortBy(_._1).toIndexedSeq) }
    ColumnBridge.column(BestCentroidL2(
      ColumnBridge.expression(sub), ColumnBridge.expression(vec),
      sorted.map(_._1),
      sorted.map(_._2.map(_._1)),
      sorted.map(_._2.map(_._2.toIndexedSeq))))
  }
}
