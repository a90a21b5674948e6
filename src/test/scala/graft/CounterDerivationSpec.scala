package graft

import graft.operators.CounterDerivation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden specs for the counter fan-out — the reference's core semantics
  * (`aggregator/aggregator.go:32-66`), which its own test suite never covered
  * (SURVEY §5). Fixture events → expected counter keys, plus the fan-out
  * invariants from SURVEY §5 item (4).
  */
class CounterDerivationSpec extends SparkSpec {

  private val rcSchema = StructType(Seq(
    StructField("event_time", TimestampType),
    StructField("wiki", StringType),
    StructField("type", StringType),
    StructField("bot", BooleanType),
    StructField("minor", BooleanType),
    StructField("length", StructType(Seq(
      StructField("old", LongType), StructField("new", LongType))))))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("recentchange fan-out matches reference semantics") {
    val rows = Seq(
      // full event: edit on enwiki by a bot, minor, grew 10 bytes
      Row(ts("2020-08-15 12:00:00"), "enwiki", "edit", true, true, Row(100L, 110L)),
      // empty wiki+type (Go omitempty: missing == ""), shrunk 5 bytes
      Row(ts("2020-08-15 13:00:00"), "", "", false, false, Row(50L, 45L)),
      // no length struct at all
      Row(ts("2020-08-16 00:00:00"), "dewiki", "log", false, false, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), rcSchema)
    val got = CounterDerivation.forRecentchange(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val day = 18489L // 2020-08-15 UTC epoch-day
    assert(got == Set(
      (day, "total", 10L), (day, "wiki_enwiki", 10L), (day, "type_edit", 10L),
      (day, "bot", 10L), (day, "minor", 10L), (day, "length_inc", 10L),
      (day, "total", -5L), (day, "length_dec", -5L),
      (day + 1, "total", 0L), (day + 1, "wiki_dewiki", 0L), (day + 1, "type_log", 0L)))
  }

  test("fan-out invariants on the events table") {
    val e = Tables.events(spark, sf)
    val total = e.count()
    val daily = CounterDerivation.dailyCounters(e).cache()
    try {
      // every event contributes exactly one 'total'
      val totalSum = daily.where(col("counter") === "total")
        .agg(sum("n")).head().getLong(0)
      assert(totalSum == total)
      // value_inc + value_dec == total (value is never null in this data)
      val incDec = daily.where(col("counter").isin("value_inc", "value_dec"))
        .agg(sum("n")).head().getLong(0)
      assert(incDec == total)
      // all-time roll-up equals a direct group-by
      val rolled = CounterDerivation.allTimeCounters(daily)
        .where(col("counter") === "total").head().getLong(1)
      assert(rolled == total)
    } finally daily.unpersist()
  }
}
