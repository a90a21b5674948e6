package graft

import graft.operators.ScaleJoins
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("salted join returns exactly the plain-join result") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      .groupBy("c_mktsegment").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = ScaleJoins.saltedJoin(
      orders,
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      key = "o_custkey", saltCol = "o_orderkey", saltFactor = 8)
      .groupBy("c_mktsegment").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("bucketed join plans without a shuffle exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse and
    // are dropped (and the dir removed) at the end of the test
    ScaleJoins.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey"), "b_orders", "o_custkey", 8)
    ScaleJoins.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_mktsegment"), "b_customer", "o_custkey", 8)
    // at test scale Catalyst prefers broadcast (which bypasses bucketing);
    // force the sort-merge path — the one bucketing de-shuffles at scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      // and it still computes the right thing
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bloom prefilter loses no matches and join result is unchanged") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_partkey")
    val dim = Tables.part(spark, sf).where(col("p_size") < 5)
      .select("p_partkey", "p_brand")
    val nBits = 61440L

    val plain = li.join(dim, li("l_partkey") === dim("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    val filtered = ScaleJoins.bloomFiltered(li, "l_partkey", dim, "p_partkey", nBits)
      .join(dim, col("l_partkey") === dim("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    assert(filtered == plain, "bloom prefilter must not change the join result")

    // reduction actually happens: survivors ≈ true matches, not the full scan
    val nBig = li.count()
    val nPass = ScaleJoins.bloomFiltered(li, "l_partkey", dim, "p_partkey", nBits).count()
    val nTrue = li.join(dim.select("p_partkey").distinct(),
      li("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(nPass >= nTrue, "no false negatives")
    assert(nPass - nTrue <= nBig / 100,
      s"false-positive rate too high: pass=$nPass true=$nTrue big=$nBig")
    assert(nPass < nBig / 2, s"prefilter should drop most rows: $nPass of $nBig")
  }

  test("bloom bitmap is broadcast and adds no shuffle to the filter path") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.part(spark, sf).where(col("p_size") < 5)
    val plan = ScaleJoins.bloomFiltered(li, "l_partkey", dim, "p_partkey", 61440L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bitmap joins must broadcast:\n$plan")
  }
}
