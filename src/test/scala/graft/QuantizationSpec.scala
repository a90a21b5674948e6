package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("sq8 codes are bytes and decode error is within half a step per dim") {
    val enc = Similarity.sq8Encode(emb, "embedding", "vec_id")
    val stats = Similarity.sq8Stats(emb, "embedding").collect()(0)
    val scs = stats.getSeq[Double](stats.fieldIndex("scs"))
    val maxErr = enc
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
      .select(max(expr(
        // max over dims of |decoded - original| / step for that dim
        "aggregate(zip_with(dv, v, (a, b) -> abs(a - b)), CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, x))"))
        .as("e"))
      .collect()(0).getDouble(0)
    // global bound: worst per-dim error <= max step * 0.5 (+ fp slack)
    assert(maxErr <= scs.max * 0.5 + 1e-9,
      s"decode error $maxErr exceeds half-step ${scs.max * 0.5}")
    val range = enc.select(
      min(array_min(col("codes"))).as("lo"), max(array_max(col("codes"))).as("hi"))
      .collect()(0)
    assert(range.getByte(0) >= -128 && range.getByte(1) <= 127)
  }

  test("sq8 ADC top-10 has high overlap with exact top-10") {
    val adc = Similarity.sq8TopK(emb, "embedding", "vec_id", queryId = 42L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", queryId = 42L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = (adc & exact).size
    assert(overlap >= 7, s"ADC top-10 recall too low: $overlap/10 (adc=$adc exact=$exact)")
  }

  test("sq8 encoding is identical under repartitioning") {
    val a = Similarity.sq8Encode(emb, "embedding", "vec_id")
    val b = Similarity.sq8Encode(emb.repartition(13), "embedding", "vec_id")
    assert(a.orderBy("vec_id").collect().toSeq == b.orderBy("vec_id").collect().toSeq,
      "sq8 codes must not depend on partitioning")
  }
}
