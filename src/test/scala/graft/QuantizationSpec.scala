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

  test("split-long exact sums equal the decimal route bit-for-bit") {
    // rq02's round-9 aggregation: money doubles -> exact cents longs,
    // per-row products summed as (hi = x div 1e6, lo = x mod 1e6) long
    // pairs, recombined per group in decimal for one final cast. The
    // contract is bit-identity with the decimal(18,2) route on ANY
    // 2-decimal data — pinned here on adversarial values: prices at the
    // TPC-H ceiling, epsilon-carrying doubles (0.07, 104853.95, ...),
    // discount/tax extremes, and products straddling the 1e6 split so hi
    // and lo both carry weight, across enough rows to exercise partial
    // aggregation on both plans.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val rows = (1 to 50000).map { i =>
      val price = ((i % 10485395) + 7) / 100.0
      val disc = (i % 11) / 100.0
      val tax = (i % 9) / 100.0
      (i % 7, price, disc, tax)
    }
    val df = spark.createDataFrame(rows).toDF("g", "price", "disc", "tax")
      .repartition(13)
    val cents = floor(col("price") * lit(100.0d) + lit(0.5d)).cast("long")
    val dsc = lit(100L) - floor(col("disc") * lit(100.0d) + lit(0.5d)).cast("long")
    val tax1 = lit(100L) + floor(col("tax") * lit(100.0d) + lit(0.5d)).cast("long")
    def splitSum(x: org.apache.spark.sql.Column, scaleDiv: Long) = {
      val lo = pmod(x, lit(1000000L))
      val hi = ((x - lo) / lit(1000000L)).cast("long")
      ((sum(hi).cast(DecimalType(38, 0)) *
        lit(1000000L).cast(DecimalType(7, 0)) +
        sum(lo).cast(DecimalType(38, 0))) /
        lit(scaleDiv).cast(DecimalType(7, 0))).cast("double")
    }
    val fast = df.groupBy("g").agg(
      splitSum(cents, 100L).as("base"),
      splitSum(cents * dsc, 10000L).as("disc_price"),
      splitSum(cents * dsc * tax1, 1000000L).as("charge"))
    val d1 = lit(1) - col("disc").cast(DecimalType(4, 2))
    val t1 = lit(1) + col("tax").cast(DecimalType(4, 2))
    val slow = df.groupBy("g").agg(
      sum(col("price").cast(DecimalType(18, 2))).cast("double").as("base"),
      sum(col("price").cast(DecimalType(18, 2)) * d1).cast("double").as("disc_price"),
      sum(col("price").cast(DecimalType(18, 2)) * d1 * t1).cast("double").as("charge"))
    val f = fast.orderBy("g").collect().toSeq
    val s = slow.orderBy("g").collect().toSeq
    assert(f == s, s"split-long must equal the decimal route exactly:\n$f\n$s")
  }
}
