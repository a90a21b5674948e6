package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{EventFiles, Sse, SseBridge}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

/** Live-ingest client behavior against a local replay server — the same
  * test shape as the reference's `pkg/ingester/sse/notify_test.go:53-164`
  * (httptest replay, resume-header assertion, error paths).
  */
class SseBridgeSpec extends SparkSpec {

  private val frame1 = Seq(
    ":ok",
    "event: message",
    """id: [{"topic":"eqiad.mediawiki.recentchange","partition":0,"timestamp":1596207527001}]""",
    """data: {"wiki":"hewiki","type":"edit","timestamp":1596207527}""",
    "")
  private val frame2 = Seq(
    "event: message",
    "id: [{\"timestamp\":1596207600000}]",
    "data: line one",
    "data: line two",
    "")
  private val frame3 = Seq(
    "id: [{\"timestamp\":1596207700000}]",
    "data: final",
    "")

  private def id(frame: Seq[String]): String =
    frame.find(_.startsWith("id: ")).get.substring(4)

  /** Ephemeral-port server; handler runs per exchange. */
  private def serve(handler: HttpExchange => Unit): (HttpServer, String) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/stream", (ex: HttpExchange) => handler(ex))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/stream")
  }

  private def writeLines(ex: HttpExchange, lines: Seq[String]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "text/event-stream")
    ex.sendResponseHeaders(200, 0)
    val out = ex.getResponseBody
    out.write(lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
    out.flush()
    out.close()
  }

  private def awaitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(20)
    cond
  }

  test("notify assembles a replayed stream and sets the accept header") {
    var accept = ""
    val (server, uri) = serve { ex =>
      accept = ex.getRequestHeaders.getFirst("Accept")
      writeLines(ex, frame1 ++ frame2 ++ frame3)
    }
    try {
      val got = mutable.Buffer[Sse.SseEvent]()
      SseBridge.notify(uri, resumeId = "", got.append(_))
      assert(accept == "text/event-stream")
      assert(got.size == 3)
      assert(got(0).id.contains("1596207527001"))
      assert(got(0).data == """{"wiki":"hewiki","type":"edit","timestamp":1596207527}""")
      assert(got(1).data == "line one\nline two")
      assert(got(2).data == "final")
    } finally server.stop(0)
  }

  test("line classification mirrors sse.go's SplitN-on-': ' exactly") {
    import graft.streaming.Metrics
    Metrics.reset()
    val (server, uri) = serve { ex =>
      // sse.go:58-84 edge cases: ':ok' (no ': ') → comment; ': heartbeat'
      // splits to ["", "heartbeat"] → NO line counter; 'foo: bar' (unmatched
      // field name) → NO line counter; 'garbage' (no ': ', no ':') → unknown.
      writeLines(ex, Seq(
        ":ok",
        ": heartbeat",
        "foo: bar",
        "garbage",
        "event: message",
        "id: [{\"timestamp\":1}]",
        "data: d1",
        "data: d2",
        ""))
    }
    try {
      SseBridge.notify(uri, "", _ => ())
      def n(t: String) = Metrics.value("pleiades_recv_event_lines_total", "type" -> t)
      assert(n("comment") == 1, "only ':ok' is a comment")
      assert(n("unknown") == 1, "only 'garbage' is unknown")
      assert(n("id") == 1 && n("event") == 1 && n("data") == 2)
      // ': heartbeat' and 'foo: bar' must increment nothing: the five labels
      // above account for every counted line out of the 8 non-blank lines.
      assert(n("comment") + n("unknown") + n("id") + n("event") + n("data") == 6)
    } finally server.stop(0)
  }

  test("connect-phase timeout counts request_timeout, not read_error") {
    import graft.streaming.Metrics
    Metrics.reset()
    // A server that accepts the TCP connection but never responds: the
    // connect phase (response-line read) times out — sse.go:120-122.
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/stream", (ex: HttpExchange) => {
      Thread.sleep(2000) // longer than the client timeout below
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    val uri = s"http://127.0.0.1:${server.getAddress.getPort}/stream"
    try {
      intercept[java.net.SocketTimeoutException] {
        SseBridge.notify(uri, "", _ => (), readTimeoutMs = 200)
      }
      assert(Metrics.value("pleiades_recv_errors_total", "type" -> "request_timeout") == 1)
      assert(Metrics.value("pleiades_recv_errors_total", "type" -> "read_error") == 0)
      assert(Metrics.value("pleiades_recv_errors_total", "type" -> "body_read_timeout") == 0)
    } finally server.stop(0)
  }

  test("notify throws on non-200 (coordinator owns the retry)") {
    val (server, uri) = serve { ex =>
      ex.sendResponseHeaders(404, -1)
      ex.close()
    }
    try intercept[java.io.IOException] {
      SseBridge.notify(uri, "", _ => ())
    } finally server.stop(0)
  }

  test("bridge resumes with Last-Event-ID after disconnect; partial frames dropped") {
    val conns = new AtomicInteger(0)
    val resumeHeaders = mutable.Buffer[String]()
    val (server, uri) = serve { ex =>
      val n = conns.incrementAndGet()
      resumeHeaders.synchronized {
        resumeHeaders += Option(
          ex.getRequestHeaders.getFirst("Last-Event-ID")).getOrElse("")
      }
      if (n == 1)
        // frames 1+2 complete, frame 3 TRUNCATED mid-frame (no blank line):
        // the partial must not be emitted, and resume must use frame 2's id.
        writeLines(ex, frame1 ++ frame2 ++ frame3.dropRight(1))
      else if (n == 2) writeLines(ex, frame3)
      else writeLines(ex, Seq()) // later reconnects: empty long-poll
    }
    val dropDir = Files.createTempDirectory("graft-sse-drop").toString
    val bridge = SseBridge.start(uri, dropDir, backoffMs = 50, prefix = "t")
    try {
      assert(awaitUntil(15000)(bridge.eventsWritten.get() == 3),
        s"expected 3 events, got ${bridge.eventsWritten.get()}")
      val headers = resumeHeaders.synchronized(resumeHeaders.toList)
      assert(headers.head == "", "first connect must not send Last-Event-ID")
      assert(headers(1) == id(frame2),
        s"reconnect must resume from the last COMPLETE event, got '${headers(1)}'")
      assert(bridge.restarts.get() >= 1)
    } finally {
      bridge.stop()
      server.stop(0)
    }
    // End-to-end: the drop directory is the engine's file source.
    val back = EventFiles.read(spark, dropDir)
    assert(back.count() == 3)
    val parsed = graft.streaming.Recentchange.parse(back)
    import org.apache.spark.sql.functions.col
    assert(parsed.where(col("wiki") === "hewiki").count() == 1)
    assert(parsed.select("event_time").na.drop().count() == 3)
  }
}
