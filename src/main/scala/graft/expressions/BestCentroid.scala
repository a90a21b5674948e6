package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Argmax-cosine centroid assignment as ONE native expression.
  *
  * The composed form — `array_max(array(struct(cosine(v, lit(c_i)), ...)))`
  * over k literal centroids — is correct but plan-hostile (r15, measured on
  * xq14 at sf5): a join downstream derives an `isnotnull(cluster)`
  * constraint, and constraint propagation rewrites it through the
  * projection, DUPLICATING the entire k-cosine argmax tree into a Filter
  * below it; the duplicated tree then blows the whole-stage-codegen method
  * limit, so the stage falls back to interpreted eval — 14x slower than
  * the exchange it replaced. As a single expression node the constraint
  * copy costs one extra k·dims loop (codegen'd, and usually eliminated by
  * subexpression elimination), and the generated code is a tight two-level
  * loop regardless of k. A centroid whose length differs from the input
  * vector is skipped (the composed form's VectorDot yields null there and
  * array_max ignores nulls); dims are uniform in practice.
  *
  * Semantics are exactly the composed form's (and the DuckDB oracles'):
  * per centroid, csim = dot(v, c) / (|v| * |c|) in double arithmetic,
  * accumulated left-to-right; the best centroid is max csim with SMALLEST
  * cid on ties; NaN ranks greatest (java.lang.Double.compare — Spark's own
  * double ordering), so a zero-norm vector deterministically takes the
  * smallest cid whose centroid also produces NaN first.
  *
  * Returns struct(cluster LONG, csim DOUBLE); null input array or null
  * element → null. Centroids ride as IndexedSeq (structural equality keeps
  * plan canonicalization/exchange reuse working) and are handed to the
  * generated code as reference objects — k·dims doubles, driver-bounded
  * exactly like the broadcast the composed form used.
  */
case class BestCentroid(child: Expression,
    cids: IndexedSeq[Long], cents: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length,
    "BestCentroid needs >= 1 centroid and one id per centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // only the element types numAt/genGet handle — DecimalType is a
      // NumericType but has no fixed-width ArrayData getter here, so it
      // must fail at analysis time, not as a runtime IllegalStateException
      // (r15 ADVICE)
      case ArrayType(ByteType | ShortType | IntegerType | LongType |
                     FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"best_centroid needs an array of a fixed-width numeric type " +
            s"(byte/short/int/long/float/double), got $t")
    }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centNorm: Array[Double] =
    centArr.map(c => math.sqrt(c.map(x => x * x).sum))

  private def numAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val t = elemType
    var i = 0
    var vNorm = 0.0d
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = numAt(v, i, t); vNorm += x * x; i += 1
    }
    vNorm = math.sqrt(vNorm)
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var first = true
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      if (cent.length == n) {
        var dot = 0.0d
        i = 0
        while (i < n) { dot += numAt(v, i, t) * cent(i); i += 1 }
        val sim = dot / (vNorm * centNorm(c))
        val cmp = java.lang.Double.compare(sim, bestSim)
        if (first || cmp > 0 || (cmp == 0 && cidArr(c) < bestCid)) {
          bestSim = sim; bestCid = cidArr(c); first = false
        }
      }
      c += 1
    }
    if (first) null else InternalRow(bestCid, bestSim)
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
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("cents", centArr, "double[][]")
      val norms = ctx.addReferenceObj("norms", centNorm, "double[]")
      val ids = ctx.addReferenceObj("cids", cidArr, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val vNorm = ctx.freshName("vNorm")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val cmp = ctx.freshName("cmp")
      val bestSim = ctx.freshName("bestSim")
      val bestCid = ctx.freshName("bestCid")
      val first = ctx.freshName("first")
      val m = ctx.freshName("m")
      val cent = ctx.freshName("cent")
      s"""
         |final int $n = $v.numElements();
         |double $vNorm = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${genGet(v, i)};
         |  $vNorm += $x * $x;
         |}
         |if (!${ev.isNull}) {
         |  $vNorm = java.lang.Math.sqrt($vNorm);
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  long $bestCid = Long.MAX_VALUE;
         |  boolean $first = true;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    final double[] $cent = $cents[$c];
         |    if ($cent.length != $n) continue;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ${genGet(v, i)} * $cent[$i];
         |    }
         |    final double $sim = $dot / ($vNorm * $norms[$c]);
         |    final int $cmp = java.lang.Double.compare($sim, $bestSim);
         |    if ($first || $cmp > 0 || ($cmp == 0 && $ids[$c] < $bestCid)) {
         |      $bestSim = $sim; $bestCid = $ids[$c]; $first = false;
         |    }
         |  }
         |  if ($first) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $bestCid, $bestSim });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BestCentroid =
    copy(child = newChild)
}

object BestCentroid {
  /** Column-level entry point: (cid, centroid-vector) pairs, any order. */
  def column(vec: Column, centroids: Seq[(Long, Seq[Double])]): Column = {
    val sorted = centroids.sortBy(_._1).toIndexedSeq
    ColumnBridge.column(BestCentroid(ColumnBridge.expression(vec),
      sorted.map(_._1), sorted.map(_._2.toIndexedSeq)))
  }
}
