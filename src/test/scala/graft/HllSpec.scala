package graft

import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  private lazy val toks = Tables.documents(spark, sf)
    .select(col("source"), explode(split(col("text"), " ")).as("term"))
    .where(length(col("term")) > 0)
    .cache()

  test("per-source HLL estimates sit within the sketch error envelope") {
    val rows = toks.groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(term))").as("approx"),
        countDistinct(col("term")).as("exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact drifts > 5%")
    }
  }

  test("union of per-source sketches equals the direct global sketch") {
    val merged = toks.groupBy("source").agg(expr("hll_sketch_agg(term)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .collect()(0).getLong(0)
    val direct = toks.agg(expr("hll_sketch_estimate(hll_sketch_agg(term))"))
      .collect()(0).getLong(0)
    assert(merged == direct,
      s"sketch union must be lossless vs direct aggregation: $merged vs $direct")
  }
}
