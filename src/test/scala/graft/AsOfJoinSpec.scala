package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks latest right row at or before left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("sym", "qt", "price")
    val trades = Seq(
      (1L, 1L, ts("2024-01-01 10:30:00")),  // matches 10:00 quote
      (2L, 1L, ts("2024-01-01 11:00:00")),  // equal time -> matches 11:00 (<=)
      (3L, 2L, ts("2024-01-01 10:00:00")),  // before any quote -> null
      (4L, 2L, ts("2024-01-01 12:00:00"))   // matches 10:30
    ).toDF("trade_id", "sym", "tt")

    val got = AsOfJoin.lastValueAsOf(trades, quotes,
      "sym", "sym", "tt", "qt", Seq("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(100.0), 2L -> Some(110.0), 3L -> None, 4L -> Some(200.0)))
  }

  test("as-of join works on string keys (no silent numeric cast)") {
    val quotes = Seq(
      ("AAPL", ts("2024-01-01 10:00:00"), 100.0),
      ("MSFT", ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("sym", "qt", "price")
    val trades = Seq(
      (1L, "AAPL", ts("2024-01-01 10:30:00")),
      (2L, "MSFT", ts("2024-01-01 10:00:00")), // before any MSFT quote -> null
      (3L, "MSFT", ts("2024-01-01 11:00:00"))
    ).toDF("trade_id", "sym", "tt")
    val got = AsOfJoin.lastValueAsOf(trades, quotes,
      "sym", "sym", "tt", "qt", Seq("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(100.0), 2L -> None, 3L -> Some(200.0)),
      "string keys must join per-key, not collapse into one null partition")
  }

  test("equal-timestamp right rows resolve deterministically (max carried tuple)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, "mkt_a"),
      (1L, ts("2024-01-01 10:00:00"), 130.0, "mkt_b"), // same (key, time)
      (1L, ts("2024-01-01 10:00:00"), 130.0, "mkt_a")  // ties on price too
    ).toDF("sym", "qt", "price", "venue")
    val trades = Seq((1L, 1L, ts("2024-01-01 10:30:00")))
      .toDF("trade_id", "sym", "tt")
    // Max (price, venue) tuple must win, identically on every run and
    // under any input partitioning.
    (1 to 3).foreach { _ =>
      val r = AsOfJoin.lastValueAsOf(trades.repartition(7), quotes.repartition(5),
        "sym", "sym", "tt", "qt", Seq("price", "venue"))
        .select("asof_price", "asof_venue").head()
      assert(r.getDouble(0) == 130.0 && r.getString(1) == "mkt_b")
    }
  }

  test("as-of join is a single-shuffle plan (no range cross join)") {
    val e = Tables.events(spark, sf).withColumn("cust", col("user_id") + 1)
    val joined = AsOfJoin.lastValueAsOf(e, Tables.orders(spark, sf),
      "cust", "o_custkey", "ts", "o_orderdate", Seq("o_orderdate"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"as-of must not plan a product join:\n$plan")
    assert(joined.count() == e.count(), "every left row must survive")
  }
}
