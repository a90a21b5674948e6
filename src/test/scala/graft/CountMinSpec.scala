package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private val D = 4
  private val W = 1024

  private lazy val toks = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("term"))
    .where(length(col("term")) > 0)
    .cache()

  test("sketch state is bounded by d*w regardless of input size") {
    val cms = CountMin.sketch(toks, "term", D, W)
    assert(cms.count() <= D.toLong * W)
    assert(cms.select("r").distinct().count() == D)
    // total mass per row equals the token count (each occurrence lands once per row)
    val n = toks.count()
    val perRow = cms.groupBy("r").agg(sum("c").as("s"))
      .select("s").collect().map(_.getLong(0)).toSeq
    assert(perRow == Seq.fill(D)(n), s"each row must hold the full mass: $perRow vs $n")
  }

  test("estimates never undercount and stay within the CMS error bound") {
    val cms = CountMin.sketch(toks, "term", D, W)
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact"))
    val n = toks.count()
    val est = CountMin.estimate(cms, exact, "term", D, W)
    assert(est.where(col("estimate") < col("exact")).count() == 0,
      "count-min must never underestimate")
    // classic bound: err <= 2N/w with prob 1-(1/2)^d; allow 4N/w slack for
    // the fixed corpus (no randomness to average over)
    val worst = est.select(max(col("estimate") - col("exact"))).collect()(0).getLong(0)
    assert(worst <= 4L * n / W, s"overestimate $worst exceeds 4N/w = ${4L * n / W}")
  }

  test("two shard sketches merge by cell-summing into the corpus sketch") {
    val a = toks.where(expr("pmod(hash(term), 2) = 0"))
    val b = toks.where(expr("pmod(hash(term), 2) = 1"))
    val merged = CountMin.sketch(a, "term", D, W)
      .unionByName(CountMin.sketch(b, "term", D, W))
      .groupBy("r", "b").agg(sum("c").as("c"))
    val whole = CountMin.sketch(toks, "term", D, W)
    val diff = merged.as("m").join(whole.as("w"), Seq("r", "b"), "full")
      .where(coalesce(col("m.c"), lit(0L)) =!= coalesce(col("w.c"), lit(0L)))
    assert(diff.count() == 0, "sketches must be mergeable by cell addition")
  }
}
