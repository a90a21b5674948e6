package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Bounded soak of the full concurrent stack (StreamDemo --soak): a local
  * replay server drips an SSE stream while the bridge, the micro-batching
  * pipeline, and the live REST API all run AT THE SAME TIME; on drain the
  * store must equal the batch twin exactly. This is the spec twin of the
  * documented live-WMF invocation (README), network-free.
  */
class SoakSpec extends SparkSpec {

  private val day0 = 18489L
  private def frame(id: Long, tsSec: Long, wiki: String, typ: String): String = {
    val key = s"""[{"topic":"x","partition":0,"timestamp":${tsSec * 1000 + id}}]"""
    val value = s"""{"id":$id,"wiki":"$wiki","type":"$typ","bot":false,"minor":false,""" +
      s""""timestamp":$tsSec,"meta":{"id":"u-$id","dt":"x","stream":"rc"}}"""
    s"event: message\nid: $key\ndata: $value\n\n"
  }

  test("soak: bridge + pipeline + API run concurrently; store equals batch twin") {
    val events = (1 to 30).map { i =>
      frame(i.toLong, day0 * 86400 + (i % 24) * 3600 + i,
        if (i % 3 == 0) "dewiki" else "enwiki",
        if (i % 5 == 0) "new" else "edit")
    }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/stream", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      events.foreach { f =>
        out.write(f.getBytes(StandardCharsets.UTF_8))
        out.flush()
        Thread.sleep(120) // drip: events arrive WHILE batches are running
      }
      // hold the stream open until the soak deadline closes it
      try Thread.sleep(60000) catch { case _: InterruptedException => () }
      out.close()
    })
    server.start()
    val uri = s"http://127.0.0.1:${server.getAddress.getPort}/stream"
    val eventsDir = Files.createTempDirectory("graft-soak-ev").toString
    val tableDir = Files.createTempDirectory("graft-soak-agg").toString
    val ckptDir = Files.createTempDirectory("graft-soak-ckpt").toString
    try {
      val report = StreamDemo.soak(spark, eventsDir, tableDir, ckptDir,
        seconds = 10, sseUri = Some(uri))
      // The deadline may cut the tail of the drip (timing-dependent under
      // load); the audit below covers exactly what was captured, so the
      // capture assertion only needs "most of the stream, mid-flight".
      assert(report.eventsDropped >= 20L,
        s"bridge must capture the bulk of the dripped stream: $report")
      assert(report.twinMatches,
        s"incremental store must equal the batch twin: $report")
      assert(report.storeRows > 0 && report.batches > 0)
      assert(report.apiProbes > 0, "API must have served during the stream")
    } finally server.stop(0)
  }
}
