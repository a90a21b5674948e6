package graft

import graft.sources.{EventFiles, Sse}
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // Verbatim wire shape from the reference's SSE fixtures (FIXTURES.md §2).
  private val capture = Seq(
    ":ok",
    "event: message",
    """id: [{"topic":"eqiad.mediawiki.recentchange","partition":0,"timestamp":1596207527001}]""",
    """data: {"wiki":"hewiki","type":"edit","timestamp":1596207527}""",
    "",
    "event: message",
    "id: [{\"timestamp\":1596207600000}]",
    "data: line one",
    "data: line two",
    "",
    ":keepalive comment mid-stream",
    "id: [{\"timestamp\":1596207700000}]",
    "data: final",
    "")

  test("SSE assembler: comments skipped, multi-data joined, blank dispatch") {
    val events = Sse.assemble(capture.iterator).toList
    assert(events.size == 3)
    assert(events.head.event == "message")
    assert(events.head.id.contains("1596207527001"))
    assert(events.head.data == """{"wiki":"hewiki","type":"edit","timestamp":1596207527}""")
    assert(events(1).data == "line one\nline two") // multi-data: joined with \n
    assert(events(2).data == "final")
  }

  test("SSE capture DataFrame path produces parseable messages") {
    val lines = capture.zipWithIndex
      .map { case (l, i) => ("cap1", i.toLong, l) }
      .toDF("capture", "line_no", "line")
    val msgs = Sse.assembleCaptures(spark, lines)
    assert(msgs.count() == 3)
    val parsed = graft.streaming.Recentchange.parse(msgs.select("key", "value"))
    val first = parsed.where(col("wiki") === "hewiki")
    assert(first.count() == 1)
    assert(first.select("event_time").head().get(0) != null)
  }

  test("SSE assembler splits multiple captures in one partition") {
    // two captures forced into one partition; second starts mid-frame state
    val cap1 = Seq("id: [{\"timestamp\":1}]", "data: a", "")
    val cap2 = Seq("data: b1", "data: b2", "", "id: [{\"timestamp\":2}]", "data: c", "")
    val lines = (cap1.zipWithIndex.map { case (l, i) => ("c1", i.toLong, l) } ++
      cap2.zipWithIndex.map { case (l, i) => ("c2", i.toLong, l) })
      .toDF("capture", "line_no", "line").coalesce(1)
    val got = Sse.assembleCaptures(spark, lines)
      .select("key", "value").as[(String, String)].collect().toSet
    assert(got == Set(
      ("[{\"timestamp\":1}]", "a"),
      ("", "b1\nb2"),
      ("[{\"timestamp\":2}]", "c")))
  }

  test("EventFiles: .dat round trip (write per-event files, read back)") {
    val dir = Files.createTempDirectory("graft-dat").toString
    val msgs = Seq(("id-1", """{"wiki":"a"}"""), ("id-2", """{"wiki":"b"}"""))
      .toDF("key", "value")
    EventFiles.writeBatch(msgs, dir)
    val back = EventFiles.read(spark, dir)
      .as[(String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(("id-1", """{"wiki":"a"}"""), ("id-2", """{"wiki":"b"}""")))
  }

  test("native session_window agrees with the batch twin on closed sessions") {
    import org.apache.spark.sql.functions._
    val evs = Seq(
      Sessionize.EventIn(1L, 1000L, 1.0), Sessionize.EventIn(1L, 1100L, 2.0),
      Sessionize.EventIn(1L, 4000L, 3.0), Sessionize.EventIn(2L, 500L, 4.0))
    // batch mode: session_window works on static DataFrames too
    val sw = Sessionize.streamingSessionWindow(
      evs.toDF("user_id", "ts_sec", "value"), gapSeconds = 1800L)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // session_window closes at last+gap; starts must match the batch twin
    assert(sw == Seq(
      (1L, 1000L, 2L, 3.0), (1L, 4000L, 1L, 3.0), (2L, 500L, 1L, 4.0)))
  }

  test("sessionize: streaming flatMapGroupsWithState agrees with batch twin") {
    // user 1: events at t=0, 100, 2000 (gap>1800 breaks), user 2: one event
    val evs = Seq(
      Sessionize.EventIn(1L, 1000L, 1.0), Sessionize.EventIn(1L, 1100L, 2.0),
      Sessionize.EventIn(1L, 4000L, 3.0), Sessionize.EventIn(2L, 500L, 4.0))
    val batch = Sessionize.batch(
      evs.toDF("user_id", "ts_sec", "value"), gapSeconds = 1800L)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(batch == Seq(
      (1L, 1000L, 1100L, 2L, 3.0), (1L, 4000L, 4000L, 1L, 3.0),
      (2L, 500L, 500L, 1L, 4.0)))

    // streaming: the closed session (first of user 1) is emitted when the
    // gap-breaking event arrives; open sessions stay in state.
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Sessionize.EventIn]
    val q = Sessionize.streaming(spark, stream.toDS(), gapSeconds = 1800L)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      stream.addData(evs: _*)
      q.processAllAvailable()
      val emitted = spark.table("sessions")
        .as[Sessionize.SessionOut].collect().toSeq
      assert(emitted == Seq(Sessionize.SessionOut(1L, 1000L, 1100L, 2L, 3.0)))
    } finally q.stop()
  }
}
