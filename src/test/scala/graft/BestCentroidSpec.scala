package graft

import graft.expressions.BestCentroid
import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native argmax-cosine expression behind Similarity.assign /
  * assignToCentroids (r15). Pins: agreement with the composed
  * array_max-over-cosine-structs reference on real embeddings, the
  * smallest-cid tie-break, null propagation, dim-mismatch skipping, and
  * codegen/interpreted equality (the interpreted path is forced through
  * the composed reference, which evaluates VectorDot outside this
  * expression).
  */
class BestCentroidSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  private def composedRef(k: Int) = {
    // the pre-r15 composed form, kept here as the semantic reference
    val centLocal = Similarity.centroids(emb, "embedding", "vec_id", k)
      .select(col("cid").cast("long"), col("c_vec").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
      .toIndexedSeq.sortBy(_._1)
    val best = array_max(array(centLocal.map { case (cid, cvec) =>
      struct(VectorFunctions.cosine(col("_v"), typedLit(cvec)).as("csim"),
        lit(-cid).as("negc"), lit(cid).as("cluster"))
    }: _*))
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("_v"))
      .select(col("vec_id"), best.getField("cluster").as("cluster"),
        best.getField("csim").as("csim"))
  }

  test("agrees with the composed argmax reference on the corpus") {
    val got = Similarity.assign(emb, "embedding", "vec_id", 8)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = composedRef(8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("csim values match the composed reference bit-for-bit") {
    val cents = Similarity.centroids(emb, "embedding", "vec_id", 8)
      .select(col("cid").as("cluster"),
        col("c_vec").cast("array<double>").as("cvec"))
    val got = Similarity.assignToCentroids(emb, "embedding", "vec_id", cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ref = composedRef(8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == ref)
  }

  test("smallest cid wins ties; nulls and dim mismatches handled") {
    val sp = spark
    import sp.implicits._
    // two identical centroids (cids 5, 2) -> tie -> cid 2 must win;
    // a third centroid with the wrong dim count must be skipped
    val cents = Seq(
      (5L, Seq(1.0d, 0.0d)), (2L, Seq(1.0d, 0.0d)), (1L, Seq(1.0d)))
    val df = Seq(
      (10L, Some(Seq(Some(3.0f), Some(4.0f)))),
      (11L, Some(Seq(Some(1.0f), None))), // null element -> null result
      (12L, None: Option[Seq[Option[Float]]])) // null array -> null
      .toDF("id", "v")
    val out = df.select(col("id"),
      graft.expressions.BestCentroid.column(col("v"), cents)
        .getField("cluster").as("cluster"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out(10L) == 2L, s"tie must take smallest cid, got ${out(10L)}")
    assert(out(11L) == null && out(12L) == null)
  }

  test("assign survives a downstream join without replanning havoc") {
    // the r15 regression shape: join on the derived cluster column used
    // to duplicate the argmax into a Filter and kill codegen; semantic
    // equality under a join is what matters here
    val assigned = Similarity.assign(emb, "embedding", "vec_id", 8)
    val q = assigned.where(col("vec_id") === 0L)
      .select(col("cluster"), col("embedding").as("q_vec"))
    val joined = assigned.where(col("vec_id") =!= 0L)
      .join(broadcast(q), "cluster")
    val expCluster = composedRef(8).where(col("vec_id") === 0L)
      .collect().head.getLong(1)
    val nExpected = composedRef(8)
      .where(col("cluster") === expCluster && col("vec_id") =!= 0L).count()
    assert(joined.count() == nExpected)
  }
}
