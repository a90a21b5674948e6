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

  test("fast bloom prefilter: no false negatives, low FP rate, join-free probe") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_partkey")
    val dim = Tables.part(spark, sf).where(col("p_size") < 5)
      .select("p_partkey", "p_brand")
    val nBits = 61440L

    val plain = li.join(dim, li("l_partkey") === dim("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    val filtered = ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", nBits)
      .join(dim, col("l_partkey") === dim("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    assert(filtered == plain, "fast bloom prefilter must not change the join result")

    val nBig = li.count()
    val nPass = ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", nBits).count()
    val nTrue = li.join(dim.select("p_partkey").distinct(),
      li("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(nPass >= nTrue, "no false negatives")
    assert(nPass - nTrue <= nBig / 100,
      s"false-positive rate too high: pass=$nPass true=$nTrue big=$nBig")

    // the probe is pure expression work — the literal-array bitmap adds
    // neither a join nor an exchange to the filtered scan
    val plan = ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", nBits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"fast probe must be join-free and shuffle-free:\n$plan")
  }

  test("fast bloom prefilter cuts shuffle records in the non-broadcast join regime") {
    // The bloom's 100 TB regime: the dim side is too big to broadcast, so
    // the join must shuffle BOTH sides — the prefilter's value is fact rows
    // dropped BEFORE the exchange. Pin that regime (no broadcast, no AQE
    // re-plan) and compare shuffle records written with and without the
    // prefilter: the bloom path must exchange only ~the semi-join
    // survivors, not the full fact side.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = Tables.lineitem(spark, sf).select("l_partkey", "l_quantity")
      val dim = Tables.part(spark, sf).where(col("p_size") < 5)
        .select("p_partkey", "p_brand")
      def shuffled(df: org.apache.spark.sql.DataFrame): Long = {
        // collect() executes THIS df's queryExecution — a noop write would
        // run a fresh execution whose metrics this plan never sees
        df.collect()
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
        }.sum
      }
      val plain = shuffled(li.join(dim, col("l_partkey") === col("p_partkey")))
      val bloomed = shuffled(
        ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", 61440L)
          .join(dim, col("l_partkey") === col("p_partkey")))
      assert(plain > 0 && bloomed > 0, s"expected shuffle joins: $plain / $bloomed")
      // the exchange carries exactly survivors + the dim side — i.e. the
      // shuffle shrinks to the semi-join selectivity, nothing hidden
      val nPass = ScaleJoins.bloomFilteredFast(
        li, "l_partkey", dim, "p_partkey", 61440L).count()
      val expected = nPass + dim.count()
      assert(bloomed <= expected,
        s"bloom path must exchange only survivors + dim: " +
          s"bloomed=$bloomed expected<=$expected plain=$plain")
      assert(bloomed < plain / 3,
        s"bloom must drop the non-matching majority before the exchange: " +
          s"bloomed=$bloomed plain=$plain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("fast bloom prefilter agrees across mismatched key types") {
    // probe side long vs build side string: both sides must fall back to
    // the common string hash, or matches silently vanish
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").limit(2000)
    val dim = Tables.part(spark, sf).where(col("p_size") < 5)
      .select(col("p_partkey").cast("string").as("p_partkey"))
    val nTrue = li.join(dim.select(col("p_partkey").cast("long").as("k")).distinct(),
      li("l_partkey") === col("k"), "left_semi").count()
    val nPass = ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", 4096L).count()
    assert(nPass >= nTrue, s"mixed-type probe lost matches: pass=$nPass true=$nTrue")
  }
}
