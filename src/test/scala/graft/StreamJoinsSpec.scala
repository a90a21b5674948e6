package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("stream-stream interval join matches within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long)]   // (user, sec)
    val convs = MemoryStream[(Long, Long, Double)] // (user, sec, amount)

    val impDf = imps.toDF().toDF("user", "isec")
      .withColumn("itime", col("isec").cast("timestamp")).drop("isec")
    val convDf = convs.toDF().toDF("user", "csec", "amount")
      .withColumn("ctime", col("csec").cast("timestamp")).drop("csec")

    val joined = StreamJoins.withinWindow(impDf, convDf, "user",
      "itime", "ctime", window = "10 MINUTES", lateness = "5 minutes")
      .select("user", "itime", "ctime", "amount")

    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      imps.addData((1L, 1000L), (2L, 1000L), (3L, 5000L))
      convs.addData(
        (1L, 1300L, 9.99),   // 300s after impression -> match
        (2L, 2000L, 5.00),   // 1000s after -> outside 10min window
        (3L, 4900L, 7.00))   // before the impression -> no match
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .select("user", "amount").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.99)),
        s"only the in-window conversion may match, got $got")
    } finally q.stop()
  }

  test("watermark passage evicts join state and drops too-late rows") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long)]
    val convs = MemoryStream[(Long, Long, Double)]
    val impDf = imps.toDF().toDF("user", "isec")
      .withColumn("itime", col("isec").cast("timestamp")).drop("isec")
    val convDf = convs.toDF().toDF("user", "csec", "amount")
      .withColumn("ctime", col("csec").cast("timestamp")).drop("csec")
    val joined = StreamJoins.withinWindow(impDf, convDf, "user",
      "itime", "ctime", window = "10 MINUTES", lateness = "5 minutes")
      .select("user", "amount")

    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode("append").start()
    try {
      imps.addData((1L, 1000L))
      convs.addData((99L, 1000L, 0.0))
      q.processAllAvailable()
      // advance both watermarks far past the impression + window + lateness
      imps.addData((50L, 100000L))
      convs.addData((98L, 100000L, 0.0))
      q.processAllAvailable()
      // this conversion WOULD have matched, but its partner's state is evicted
      // and the row itself is behind the watermark -> dropped
      convs.addData((1L, 1200L, 9.99))
      q.processAllAvailable()
      val got = spark.table("sj_late").as[(Long, Double)].collect().toSet
      assert(got.isEmpty, s"late conversion must be dropped, got $got")
    } finally q.stop()
  }
}
