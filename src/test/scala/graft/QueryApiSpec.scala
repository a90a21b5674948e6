package graft

import graft.streaming.{CounterStore, QueryApi}
import java.io.IOException
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The HTTP query + metrics surface (S11/S12) against a real counter store:
  * response shapes and status codes mirror the reference's
  * `web/handler.go` / `prom_middleware.go` behavior.
  */
class QueryApiSpec extends SparkSpec {

  private def get(url: String): (Int, String, Map[String, String]) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      catch { case _: IOException => "" }
    val headers = Seq("Content-Type", "Access-Control-Allow-Origin")
      .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
    conn.disconnect()
    (status, body, headers)
  }

  private lazy val (api, port, store) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-queryapi").toString
    Seq(
      (18490L, "total", 120L), (18490L, "bot", 30L), (18490L, "wiki_enwiki", 55L),
      (18491L, "total", 7L),
      (18400L, "total", 999L) // below the day>18488 quality floor
    ).toDF("day", "counter", "n")
      .write.partitionBy("day").parquet(dir + "/counters")
    val st = new CounterStore(spark, dir + "/counters")
    val a = new QueryApi(st)
    val p = a.start()
    (a, p, st)
  }

  test("GET /api/stats/{day} returns the reference Counters shape with CORS") {
    val (status, body, headers) = get(s"http://127.0.0.1:$port/api/stats/18490")
    assert(status == 200)
    assert(headers("Content-Type").startsWith("application/json"))
    assert(headers("Access-Control-Allow-Origin") == "*")
    assert(body == """{"Since":1597536000,"Counters":[""" +
      """{"Name":"bot","Description":"","Value":30},""" +
      """{"Name":"total","Description":"","Value":120},""" +
      """{"Name":"wiki_enwiki","Description":"","Value":55}]}""")
  }

  test("GET /api/stats/{day} rejects non-numeric day with 400") {
    val (status, _, _) = get(s"http://127.0.0.1:$port/api/stats/yesterday")
    assert(status == 400)
  }

  test("GET /api/stats/{day} returns 404 for a day with no counters") {
    val (status, _, _) = get(s"http://127.0.0.1:$port/api/stats/12345")
    assert(status == 404)
  }

  test("GET /api/days lists day strings above the quality floor, sorted") {
    val (status, body, _) = get(s"http://127.0.0.1:$port/api/days")
    assert(status == 200)
    assert(body == """["18490","18491"]""") // 18400 filtered by day > 18488
  }

  test("GET /metrics exposes template-labelled counters and durations") {
    get(s"http://127.0.0.1:$port/api/stats/18490") // ensure at least one hit
    val (status, body, _) = get(s"http://127.0.0.1:$port/metrics")
    assert(status == 200)
    assert(body.contains("# TYPE pleiades_web_http_response_total counter"))
    // raw paths collapse to the template — bounded label cardinality
    assert(body.contains("""pleiades_web_http_response_total{path="/api/stats/{day}",status="200"}"""))
    assert(!body.contains("18490\"")) // no raw day in any label
    assert(body.contains("""pleiades_web_http_duration_seconds_count{path="/api/stats/{day}"}"""))
    // the reference registers both duration metrics as HISTOGRAMS
    // (prom_middleware.go:13-16, handler.go:19-22) — cumulative _bucket
    // series with the client default bounds, so histogram_quantile() works
    assert(body.contains("# TYPE pleiades_web_http_duration_seconds histogram"))
    assert(body.contains("# TYPE pleiades_web_counter_marshal_duration_seconds histogram"))
    assert(body.contains("""pleiades_web_http_duration_seconds_bucket{path="/api/stats/{day}",le="0.005"}"""))
    assert(body.contains("""pleiades_web_http_duration_seconds_bucket{path="/api/stats/{day}",le="+Inf"}"""))
    // cumulative: the +Inf bucket equals _count
    val inf = """pleiades_web_http_duration_seconds_bucket\{path="/metrics",le="\+Inf"\} (\d+)""".r
    val cnt = """pleiades_web_http_duration_seconds_count\{path="/metrics"\} (\d+)""".r
    for (i <- inf.findFirstMatchIn(body); c <- cnt.findFirstMatchIn(body))
      assert(i.group(1) == c.group(1))
  }

  test("marshal timer wraps the store fetch, not just the json rendering") {
    graft.streaming.Metrics.reset()
    val api3 = new QueryApi(store)
    val p3 = api3.start()
    try {
      get(s"http://127.0.0.1:$p3/api/stats/18490")
      val (_, body, _) = get(s"http://127.0.0.1:$p3/metrics")
      // handler.go:138 — the timer spans the Keys/MGet query + parsing. A
      // collect() through Spark takes well over a millisecond; the rendering
      // alone is sub-microsecond, so this catches an inverted timer scope.
      val sum = """pleiades_web_counter_marshal_duration_seconds_sum\{operation="get_counters"\} ([0-9.eE-]+)""".r
      val s = sum.findFirstMatchIn(body).map(_.group(1).toDouble)
      assert(s.exists(_ > 0.001), s"get_counters sum should include the store query, got $s")
      // handler.go:145-147 — the empty-day early return skips ObserveDuration
      get(s"http://127.0.0.1:$p3/api/stats/12345")
      val (_, body2, _) = get(s"http://127.0.0.1:$p3/metrics")
      val count = """pleiades_web_counter_marshal_duration_seconds_count\{operation="get_counters"\} (\d+)""".r
      assert(count.findFirstMatchIn(body2).map(_.group(1)) == Some("1"),
        "404 day must not observe the get_counters timer")
    } finally api3.stop()
  }

  test("metric names match the reference's dashboard surface exactly") {
    get(s"http://127.0.0.1:$port/api/stats/18490")
    get(s"http://127.0.0.1:$port/api/days")
    // the registry is process-wide — other suites (SseBridgeSpec, SoakSpec)
    // may have already incremented it in a full test run
    graft.streaming.Metrics.reset()
    graft.streaming.Metrics.inc("pleiades_recv_events_total")
    graft.streaming.Metrics.inc("pleiades_recv_event_lines_total", "type" -> "data")
    graft.streaming.Metrics.inc("pleiades_goroutine_restarts", "component" -> "wmf_consumer")
    val (_, body, _) = get(s"http://127.0.0.1:$port/metrics")
    // prom_middleware.go / handler.go / sse.go / coordinator.go names
    assert(body.contains("""pleiades_web_counter_marshal_duration_seconds_sum{operation="get_counters"}"""))
    assert(body.contains("""pleiades_web_counter_marshal_duration_seconds_sum{operation="get_days"}"""))
    assert(body.contains("pleiades_recv_events_total 1"))
    assert(body.contains("""pleiades_recv_event_lines_total{type="data"} 1"""))
    assert(body.contains("""pleiades_goroutine_restarts{component="wmf_consumer"} 1"""))
    graft.streaming.Metrics.reset()
  }

  test("unknown /api route returns 404") {
    val (status, _, _) = get(s"http://127.0.0.1:$port/api/nope")
    assert(status == 404)
  }

  test("pre-first-merge store: /api/days is [] and /api/stats is 404, not 500") {
    // the reference over an empty Redis returns an empty key list
    // (handler.go:183-211) and a 404 for a counter-less day
    // (handler.go:145-147); a missing parquet path must read the same way
    val dir = Files.createTempDirectory("graft-qapi-empty").toString + "/counters"
    val api0 = new QueryApi(new CounterStore(spark, dir))
    val p0 = api0.start()
    try {
      val (ds, dbody, _) = get(s"http://127.0.0.1:$p0/api/days")
      assert(ds == 200 && dbody == "[]", s"got $ds $dbody")
      val (ss, _, _) = get(s"http://127.0.0.1:$p0/api/stats/18490")
      assert(ss == 404)
    } finally api0.stop()
  }

  test("concurrent merges never 500 a reader (generation-swap isolation)") {
    // r16 VERDICT #3: the in-place dynamic partition overwrite was a
    // delete+swap under the reader — a concurrent /api/days that listed
    // files pre-swap threw FAILED_READ_FILE and surfaced a 500 (observed
    // in the r16 SoakSpec log). With CounterTable's generation dirs +
    // atomic pointer, readers resolve an immutable generation; this
    // hammers the API from two threads across 12 full-store rewrites and
    // requires every response to be a 200.
    import spark.implicits._
    import graft.streaming.CounterPipeline
    val dir = Files.createTempDirectory("graft-qapi-merge").toString + "/counters"
    def batch(v: Long) = (0 until 10)
      .map(d => (18490L + d, "total", v + d, v))
      .toDF("day", "counter", "n", "growth")
    CounterPipeline.mergeBatch(spark, dir)(batch(1L), 0L)
    val api2 = new QueryApi(new CounterStore(spark, dir))
    val p2 = api2.start()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = Seq(s"http://127.0.0.1:$p2/api/days",
      s"http://127.0.0.1:$p2/api/stats/18492").map { url =>
      new Thread(() => {
        while (!stop.get()) {
          try statuses.add(get(url)._1)
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    readers.foreach(_.start())
    try {
      // every batch changes every day's totals -> 12 full generation swaps
      (1 to 12).foreach(i => CounterPipeline.mergeBatch(spark, dir)(batch(i + 1L), i.toLong))
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
      api2.stop()
    }
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty, s"reader threads must not throw: ${failures.asScala.headOption}")
    val seen = statuses.asScala.map(_.toInt).toSeq
    assert(seen.nonEmpty && seen.forall(_ == 200),
      s"every concurrent read must be a 200, got ${seen.groupBy(identity).view.mapValues(_.size).toMap}")
  }

  test("static SPA serving: index fallback, content types, traversal rejected") {
    val webDir = Files.createTempDirectory("graft-spa")
    Files.writeString(webDir.resolve("index.html"), "<html>pleiades</html>")
    Files.createDirectories(webDir.resolve("js"))
    Files.writeString(webDir.resolve("js/app.js"), "console.log('hi')")
    val api2 = new QueryApi(store, staticDir = Some(webDir.toString))
    val p2 = api2.start()
    try {
      val (s1, b1, h1) = get(s"http://127.0.0.1:$p2/")
      assert(s1 == 200 && b1.contains("pleiades"))
      assert(h1("Content-Type").startsWith("text/html"))
      val (s2, b2, h2) = get(s"http://127.0.0.1:$p2/js/app.js")
      assert(s2 == 200 && b2.contains("console") && h2("Content-Type") == "text/javascript")
      assert(get(s"http://127.0.0.1:$p2/missing.css")._1 == 404)
      // real-path containment, not string filtering
      assert(get(s"http://127.0.0.1:$p2/%2e%2e/%2e%2e/etc/passwd")._1 == 404)
      // a symlink INSIDE the build dir pointing outside must not escape
      try {
        Files.createSymbolicLink(webDir.resolve("esc"), java.nio.file.Paths.get("/etc"))
        assert(get(s"http://127.0.0.1:$p2/esc/passwd")._1 == 404)
      } catch { case _: UnsupportedOperationException => () } // no-symlink FS
      // the API stays mounted alongside the SPA, like frontend.go's router
      assert(get(s"http://127.0.0.1:$p2/api/days")._1 == 200)
      // prom_middleware wraps ALL routes in the reference, so the static
      // path must have a duration series matching its response counter
      val (_, mbody, _) = get(s"http://127.0.0.1:$p2/metrics")
      assert(mbody.contains("""pleiades_web_http_duration_seconds_count{path="/static"}"""))
      assert(mbody.contains("""pleiades_web_http_duration_seconds_bucket{path="/static",le="+Inf"}"""))
    } finally api2.stop()
  }
}
