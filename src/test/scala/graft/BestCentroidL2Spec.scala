package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native argmin-L2 expression behind pqEncode / the grouped L2
  * trainer's per-round assignment (r17 — the xq57 residual fix). Pins:
  * bit-exact agreement with the explode→broadcast-join→min_by join form
  * it replaced (d2 values AND winners, across every subspace), the
  * smallest-cluster tie-break, null/unknown-sub/dim-mismatch handling,
  * and that pqTopK's end result is unchanged by the rewrite.
  */
class BestCentroidL2Spec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private val M = 4
  private val SubDim = 16
  private val K = 16

  /** The pre-r17 join form, kept as the semantic reference: k× explode
    * fan-out, broadcast codebook join, min_by(cluster, struct(d2, cluster))
    * — same l2d2 spelling as the production path had.
    */
  private def joinFormCodes(cb: org.apache.spark.sql.DataFrame) = {
    def l2d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b)) +
        VectorFunctions.dot(b, b)
    val subs = emb.select(col("vec_id"), posexplode(array((0 until M).map(s =>
      slice(col("embedding").cast("array<double>"), s * SubDim + 1, SubDim)): _*))
      .as(Seq("sub", "sv")))
    subs.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"), col("cluster"),
        l2d2(col("sv"), col("cvec")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cluster"), struct(col("d2"), col("cluster"))).as("code"))
  }

  test("pqEncode equals the join form it replaced, code for code") {
    val cb = Similarity.pqTrain(emb, "embedding", "vec_id", M, SubDim, K, iters = 2)
    val got = Similarity.pqEncode(emb, "embedding", "vec_id", cb, M, SubDim)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val ref = joinFormCodes(cb)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == ref)
  }

  test("d2 values match the join form's l2d2 bit-for-bit") {
    val cb = Similarity.pqTrain(emb, "embedding", "vec_id", M, SubDim, K, iters = 2)
    val cbLocal = cb.select(col("sub").cast("int"), col("cluster").cast("long"),
        col("cvec").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1)
      .map { case (s, rows) =>
        (s, rows.map(r => (r._2, r._3: Seq[Double])).sortBy(_._1).toSeq) }
    val subs = emb.select(col("vec_id"), posexplode(array((0 until M).map(s =>
      slice(col("embedding").cast("array<double>"), s * SubDim + 1, SubDim)): _*))
      .as(Seq("sub", "sv")))
    val best = graft.expressions.BestCentroidL2.column(col("sub"), col("sv"), cbLocal)
    val got = subs.select(col("vec_id"), col("sub"),
        best.getField("cluster").as("code"), best.getField("d2").as("d2"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // the winner's d2 recomputed via the join form's exact column tree
    def l2d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b)) +
        VectorFunctions.dot(b, b)
    val ref = subs.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"), col("cluster"),
        l2d2(col("sv"), col("cvec")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("sub"),
        col("m.cluster").as("code"), col("m.d2").as("d2"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == ref)
  }

  test("smallest cluster wins ties; nulls, unknown sub, dim mismatch handled") {
    val sp = spark
    import sp.implicits._
    // two identical centroids (ids 5, 2) in sub 0 -> tie -> 2 must win;
    // sub 1's only centroid has the wrong width -> skipped -> null;
    // sub 9 has no codebook -> null (the join form's row-drop)
    val cbLocal = Map(
      0 -> Seq((5L, Seq(1.0d, 0.0d)), (2L, Seq(1.0d, 0.0d))),
      1 -> Seq((3L, Seq(1.0d, 2.0d, 3.0d))))
    val df = Seq(
      (10L, 0, Some(Seq(Some(3.0d), Some(4.0d)))),
      (11L, 1, Some(Seq(Some(1.0d), Some(2.0d)))), // width 2 vs centroid 3
      (12L, 9, Some(Seq(Some(1.0d), Some(2.0d)))), // unknown sub
      (13L, 0, Some(Seq(Some(1.0d), None))), // null element
      (14L, 0, None: Option[Seq[Option[Double]]])) // null array
      .toDF("id", "sub", "v")
    val out = df.select(col("id"),
      graft.expressions.BestCentroidL2.column(col("sub"), col("v"), cbLocal)
        .getField("cluster").as("code"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out(10L) == 2L, s"tie must take smallest cluster, got ${out(10L)}")
    assert(out(11L) == null && out(12L) == null &&
      out(13L) == null && out(14L) == null)
  }

  test("analysis-time reject of non-fixed-width inputs") {
    val sp = spark
    import sp.implicits._
    val df = Seq((0, Seq(BigDecimal(1)))).toDF("sub", "v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.expressions.BestCentroidL2.column(col("sub"), col("v"),
        Map(0 -> Seq((1L, Seq(1.0d)))))).collect()
    }
    assert(ex.getMessage.contains("best_centroid_l2"))
  }
}
