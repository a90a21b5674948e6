package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Properties of the k-means trainer (the oracle query xq41 pins exact
  * values; these pin the invariants).
  */
class KmeansSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  private def centsOf(fit: DataFrame): DataFrame =
    fit.groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid_val")))),
        x => x.getField("centroid_val")).as("cvec"))

  test("membership counts cover every vector exactly once") {
    val fit = Similarity.kmeansFit(emb, "embedding", "vec_id", k = 8, iters = 2)
    val n = emb.count()
    val perDim = fit.groupBy("dim").agg(sum("n_members").as("tot")).select("tot").distinct().collect()
    assert(perDim.length == 1 && perDim.head.getLong(0) == n)
  }

  test("training improves the clustering objective over the untrained init") {
    def objective(cents: DataFrame): Double =
      Similarity.assignToCentroids(emb, "embedding", "vec_id", cents)
        .agg(avg("csim")).collect().head.getDouble(0)
    val init = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cluster"), col("embedding").cast("array<double>").as("cvec"))
    val trained = centsOf(Similarity.kmeansFit(emb, "embedding", "vec_id", 8, 2))
    assert(objective(trained) > objective(init),
      "mean member-to-centroid cosine should rise with Lloyd iterations")
  }

  test("fit is deterministic under input repartitioning") {
    val a = Similarity.kmeansFit(emb, "embedding", "vec_id", 8, 2)
    val b = Similarity.kmeansFit(emb.repartition(13), "embedding", "vec_id", 8, 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
