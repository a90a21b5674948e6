package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{LongAdder, DoubleAdder}
import scala.jdk.CollectionConverters._

/** The reference's HTTP query + metrics surface (SURVEY §2.1 S11/S12) over
  * the counter store:
  *
  *   - `GET /api/stats`        — counters for "today" (`web/handler.go:56-87`,
  *     julian day = now/86400)
  *   - `GET /api/stats/{day}`  — counters for a day; 400 on a non-numeric
  *     day, 404 when the day has no counters (`handler.go:89-126`)
  *   - `GET /api/days`         — sorted day strings above the quality floor
  *     (`handler.go:183-211`, floor `day > 18488`)
  *   - `GET /metrics`          — Prometheus text exposition: per-path-template
  *     request counters/durations (the reference's `prom_middleware.go`
  *     histograms) plus streaming batch progress gauges (`cmd/metrics.go`)
  *
  * Response shapes mirror the reference exactly: `{"Since":d*86400,
  * "Counters":[{"Name":…,"Description":"","Value":…}]}` and
  * `["18489","18490"]`, with `Content-Type: application/json` and the CORS
  * header (`handler.go:33-34`).
  *
  * Scale posture: every route is a partition-pruned point query over the
  * day-partitioned counter store returning metadata-scale results (one row
  * per counter name per day) — the driver-side collect at the API boundary
  * is the same shape as the reference serving `MGET day_<d>_*` from Redis.
  * Metrics are keyed by path TEMPLATE (`/api/stats/{day}`), not raw path,
  * so label cardinality stays bounded (`prom_middleware.go:44-46`).
  *
  * Built on the JDK's `com.sun.net.httpserver` — no extra dependencies.
  */
final class QueryApi(store: CounterStore, recorder: Option[ProgressRecorder] = None,
    minDay: Long = 18488L, staticDir: Option[String] = None) {

  private var server: HttpServer = _
  private val statusCount = new ConcurrentHashMap[(String, Int), LongAdder]()
  // Both duration metrics are HISTOGRAMS in the reference (promauto
  // NewHistogramVec with default buckets, `prom_middleware.go:13-16`,
  // `handler.go:19-22`), so histogram_quantile()/_bucket dashboard panels
  // keep working, not just rate(_sum)/rate(_count).
  private val httpDur = new HistogramVec("path")
  private val marshalDur = new HistogramVec("operation")

  /** Bind and start; `port=0` picks an ephemeral port. Returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api", handler(apiRoute _))
    server.createContext("/metrics", handler((_, _) => (200, "text/plain; version=0.0.4", metricsText)))
    // frontend.go:42 — the SPA file server mounted at "/" (the reference
    // embeds its Vue build via vfsgen; here any directory serves, so a
    // reference user drops the same `static/` build output in unchanged).
    staticDir.foreach(dir => server.createContext("/", staticHandler(dir)))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** Wrap a route in the metrics middleware (template-labelled count + duration). */
  private def handler(route: (String, HttpExchange) => (Int, String, String)): HttpHandler =
    (ex: HttpExchange) => {
      val t0 = System.nanoTime()
      val path = ex.getRequestURI.getPath
      val template = pathTemplate(path)
      val (status, ctype, body) =
        try route(path, ex)
        catch {
          case e: Exception =>
            System.err.println(s"QueryApi error on $path: $e")
            (500, "text/plain", "internal error")
        }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
      ex.close()
      statusCount.computeIfAbsent((template, status), _ => new LongAdder).increment()
      httpDur.observe(template, (System.nanoTime() - t0) / 1e9)
    }

  private def pathTemplate(path: String): String = path match {
    case "/api/stats" | "/api/stats/" => "/api/stats"
    case p if p.startsWith("/api/stats/") => "/api/stats/{day}"
    case p if p.startsWith("/api/days") => "/api/days"
    case p if p.startsWith("/metrics") => "/metrics"
    case p => p
  }

  private def apiRoute(path: String, ex: HttpExchange): (Int, String, String) = path match {
    case "/api/stats" | "/api/stats/" =>
      statsResponse(System.currentTimeMillis() / 86400000L)
    case p if p.startsWith("/api/stats/") =>
      val raw = p.stripPrefix("/api/stats/")
      raw.toLongOption match {
        case None => (400, "application/json", "")
        case Some(day) => statsResponse(day)
      }
    case "/api/days" | "/api/days/" =>
      // handler.go:183-211 — unique days above the floor, string-sorted ASC.
      // partition discovery may narrow `day` to int — don't assume width.
      // handler.go:179 — the get_days timer starts at the top of getDays and
      // wraps the keys query + dedup + sort; json.Marshal is OUTSIDE it.
      val t0 = System.nanoTime()
      // A store that has not received its first merge yet reads as a
      // missing/empty parquet path (AnalysisException). The reference
      // over an empty Redis returns [] with 200 (`handler.go:183-211` —
      // KEYS on an empty keyspace is an empty list, not an error); a 500
      // here was a fidelity gap the SoakSpec startup window exposed.
      val days =
        try store.availableDays(minDay).select("day").collect()
          .map(_.get(0).toString).sorted
        catch { case _: org.apache.spark.sql.AnalysisException =>
          Array.empty[String] }
      marshalDur.observe("get_days", (System.nanoTime() - t0) / 1e9)
      val body = days.map(jsonStr).mkString("[", ",", "]")
      (200, "application/json", body)
    case _ => (404, "application/json", "")
  }

  private def statsResponse(day: Long): (Int, String, String) = {
    // handler.go:138-169 — the get_counters timer starts at the top of
    // getAllCounters and wraps the store fetch + per-row (name, value)
    // parsing; json.Marshal happens outside it, and the empty-day early
    // return skips ObserveDuration entirely.
    val t0 = System.nanoTime()
    // pre-first-merge store: same empty-keyspace fidelity as /api/days —
    // a day with no counters is a 404, whether the store is empty or
    // just doesn't hold that day (handler.go:145-147)
    val counters =
      try store.countersForDay(day).collect()
      catch { case _: org.apache.spark.sql.AnalysisException =>
        Array.empty[org.apache.spark.sql.Row] }
    if (counters.isEmpty) (404, "application/json", "")
    else {
      val parsed = counters.map(r => (r.getString(0), r.getLong(1)))
      marshalDur.observe("get_counters", (System.nanoTime() - t0) / 1e9)
      val items = parsed.map { case (n, v) =>
        s"""{"Name":${jsonStr(n)},"Description":"","Value":$v}"""
      }
      val body = s"""{"Since":${day * 86400},"Counters":[${items.mkString(",")}]}"""
      (200, "application/json", body)
    }
  }

  /** Static-asset file server (`frontend.go:42`'s
    * `http.FileServer(static.Assets)` behavior): "/" serves `index.html`,
    * anything else resolves inside `dir` only (traversal attempts are
    * rejected by real-path containment, not string filtering), content type
    * by extension, 404 on miss. Binary-safe — byte pass-through.
    */
  private def staticHandler(dir: String): HttpHandler = {
    // Resolve the root ONCE — a bad --static dir fails at startup with a
    // clear error instead of per-request connection drops.
    val root = Paths.get(dir).toRealPath()
    (ex: HttpExchange) => {
      // prom_middleware.go:42-51 is applied to ALL routes including the "/"
      // file server, so the static path records duration, not just status.
      val t0 = System.nanoTime()
      val rel = ex.getRequestURI.getPath.stripPrefix("/") match {
        case "" => "index.html"
        case p => p
      }
      val notFound = (404, "text/plain", "not found".getBytes(StandardCharsets.UTF_8))
      val (status, ctype, bytes) =
        try {
          // REAL-path containment: toRealPath resolves symlinks too, so a
          // stray link inside the build dir cannot escape the root (a
          // normalize-only check would follow it out).
          val target = root.resolve(rel).normalize().toRealPath()
          if (!target.startsWith(root) || !Files.isRegularFile(target)) notFound
          else (200, contentType(rel), Files.readAllBytes(target))
        } catch {
          case _: java.nio.file.NoSuchFileException => notFound
          case e: Exception =>
            System.err.println(s"QueryApi static error on /$rel: $e")
            (500, "text/plain", "internal error".getBytes(StandardCharsets.UTF_8))
        }
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
      ex.close()
      statusCount.computeIfAbsent(("/static", status), _ => new LongAdder).increment()
      httpDur.observe("/static", (System.nanoTime() - t0) / 1e9)
    }
  }

  private def contentType(name: String): String = {
    val ext = name.substring(name.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "html" | "htm" => "text/html; charset=utf-8"
      case "js" => "text/javascript"
      case "css" => "text/css"
      case "json" | "map" => "application/json"
      case "png" => "image/png"
      case "jpg" | "jpeg" => "image/jpeg"
      case "svg" => "image/svg+xml"
      case "ico" => "image/x-icon"
      case "woff" => "font/woff"
      case "woff2" => "font/woff2"
      case _ => "application/octet-stream"
    }
  }

  /** A Prometheus histogram vector with the client library's DEFAULT buckets
    * (what `promauto.NewHistogramVec` uses when `Buckets` is unset — both
    * reference duration metrics rely on that default): cumulative `_bucket`
    * series per label including `le="+Inf"`, plus `_sum`/`_count`.
    */
  private final class HistogramVec(labelKey: String) {
    import java.util.concurrent.atomic.AtomicLongArray
    private val bounds =
      Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
    private val counts = new ConcurrentHashMap[String, AtomicLongArray]()
    private val sums = new ConcurrentHashMap[String, DoubleAdder]()

    def observe(label: String, seconds: Double): Unit = {
      val arr = counts.computeIfAbsent(label,
        _ => new AtomicLongArray(bounds.length + 1))
      var i = 0
      while (i < bounds.length && seconds > bounds(i)) i += 1
      arr.incrementAndGet(i) // bounds.length == the +Inf bucket
      sums.computeIfAbsent(label, _ => new DoubleAdder).add(seconds)
    }

    def renderInto(sb: StringBuilder, name: String, help: String): Unit = {
      sb ++= s"# HELP $name $help\n"
      sb ++= s"# TYPE $name histogram\n"
      counts.asScala.toSeq.sortBy(_._1).foreach { case (k, arr) =>
        var cum = 0L
        var i = 0
        while (i < bounds.length) {
          cum += arr.get(i)
          sb ++= s"""${name}_bucket{$labelKey="$k",le="${fmtBound(bounds(i))}"} $cum""" + "\n"
          i += 1
        }
        cum += arr.get(bounds.length)
        sb ++= s"""${name}_bucket{$labelKey="$k",le="+Inf"} $cum""" + "\n"
        // A scrape can interleave a label's FIRST observe() between its
        // counts insert and its sums insert — materialize the sums entry
        // here instead of assuming it exists.
        sb ++= s"""${name}_sum{$labelKey="$k"} ${
          sums.computeIfAbsent(k, _ => new DoubleAdder).sum}""" + "\n"
        sb ++= s"""${name}_count{$labelKey="$k"} $cum""" + "\n"
      }
    }

    // Go's exposition prints bucket bounds without trailing zeros (0.005,
    // 0.25, 1, 10) — match it so scrape-diff tooling sees identical series.
    private def fmtBound(d: Double): String =
      if (d == d.floor) d.toLong.toString else d.toString
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  /** Prometheus text exposition (`cmd/metrics.go` + `prom_middleware.go`) —
    * the metric and label NAMES are the reference's exactly
    * (`pleiades_web_http_response_total{path,status}`,
    * `pleiades_web_http_duration_seconds{path}`,
    * `pleiades_web_counter_marshal_duration_seconds{operation}`,
    * `pleiades_aggregator_event_count_total`, plus the ingest-side registry
    * in [[Metrics]]), so the reference's Grafana `dashboard.json` panels
    * port unchanged. Durations render as HISTOGRAMS (cumulative `_bucket`
    * with the client default bounds + `_sum`/`_count`), matching the
    * reference's `NewHistogramVec` registrations so both
    * `rate(_sum)/rate(_count)` and `histogram_quantile(_bucket)` panels work.
    * `graft_streaming_*` rows extend the surface with Spark-native batch
    * progress (no reference equivalent).
    */
  private def metricsText: String = {
    val sb = new StringBuilder
    sb ++= "# HELP pleiades_web_http_response_total Total number of HTTP responses sent\n"
    sb ++= "# TYPE pleiades_web_http_response_total counter\n"
    statusCount.asScala.toSeq.sortBy { case ((p, s), _) => (p, s) }.foreach {
      case ((p, s), n) =>
        sb ++= s"""pleiades_web_http_response_total{path="$p",status="$s"} ${n.sum}""" + "\n"
    }
    httpDur.renderInto(sb, "pleiades_web_http_duration_seconds",
      "Duration of HTTP requests")
    marshalDur.renderInto(sb, "pleiades_web_counter_marshal_duration_seconds",
      "Time taken to generate the stats json")
    Metrics.renderInto(sb)
    recorder.foreach { r =>
      val snap = r.snapshot
      // aggregator.go:36-41 — events processed by the aggregation pipeline;
      // here the rows ingested across tracked streaming queries.
      sb ++= "# HELP pleiades_aggregator_event_count_total Number of events processed\n"
      sb ++= "# TYPE pleiades_aggregator_event_count_total counter\n"
      sb ++= s"pleiades_aggregator_event_count_total ${snap.map(_.numInputRows).sum}\n"
      sb ++= "# HELP graft_streaming_input_rows_total Rows ingested per streaming query\n"
      sb ++= "# TYPE graft_streaming_input_rows_total counter\n"
      snap.groupBy(_.queryName).toSeq.sortBy(_._1).foreach { case (q, ps) =>
        sb ++= s"""graft_streaming_input_rows_total{query="$q"} ${ps.map(_.numInputRows).sum}""" + "\n"
      }
      sb ++= "# HELP graft_streaming_last_batch_id Latest completed micro-batch id\n"
      sb ++= "# TYPE graft_streaming_last_batch_id gauge\n"
      snap.groupBy(_.queryName).toSeq.sortBy(_._1).foreach { case (q, ps) =>
        sb ++= s"""graft_streaming_last_batch_id{query="$q"} ${ps.map(_.batchId).max}""" + "\n"
      }
    }
    sb.toString
  }
}
