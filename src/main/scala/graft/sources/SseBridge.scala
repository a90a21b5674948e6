package graft.sources

import java.io.{BufferedReader, IOException, InputStreamReader}
import java.net.HttpURLConnection
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

import graft.streaming.Metrics

/** Live SSE ingestion bridge (S1): a long-poll `text/event-stream` client
  * that assembles frames with `Sse.assemble` and drops each event as a
  * 2-line `.dat` file for the streaming file source
  * (`CounterPipeline.fromFileDrop`) to pick up.
  *
  * Mirrors the reference client's protocol behavior
  * (`pkg/ingester/sse/sse.go:90-188`): `Accept: text/event-stream`,
  * `Last-Event-ID` resume header on reconnect (`sse.go:101-106`), 60 s read
  * timeout (`sse.go:109-132`), emit-on-blank-line via the shared assembler
  * (`sse.go:176-183`) — plus the coordinator's backoff-restart loop
  * (`pkg/ingester/coordinator.go:139-145`, 30 s default).
  *
  * This is deliberately a DRIVER-SIDE helper, not a Spark job: the wire
  * format is one sequential HTTP stream, and the reference likewise runs
  * exactly one ingester (`README.md:28-29`). Scale-out happens downstream —
  * the drop directory is consumed by a parallel Structured Streaming file
  * source (or, in a full deployment, this same client feeds a Kafka topic
  * instead; the engine side is identical from there on).
  */
object SseBridge {

  /** One connection attempt: GET `uri`, resuming from `resumeId` when
    * non-empty; every assembled frame goes to `onEvent` until the server
    * closes the stream, an error occurs, or `stop()` turns true. Errors
    * (non-200, read timeout, truncation) throw — the restart loop in
    * `start` owns recovery, like the reference's coordinator.
    */
  def notify(uri: String, resumeId: String, onEvent: Sse.SseEvent => Unit,
      stop: () => Boolean = () => false, readTimeoutMs: Int = 60000): Unit = {
    val conn = new java.net.URI(uri).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestProperty("Accept", "text/event-stream")
    if (resumeId.nonEmpty) conn.setRequestProperty("Last-Event-ID", resumeId)
    conn.setConnectTimeout(readTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      // Connect phase (`sse.go:109-132`): a timeout here is its own error
      // type `request_timeout` (sse.go:120-122); any OTHER connect failure —
      // including a non-2xx status (sse.go:127-130) — returns an error
      // WITHOUT incrementing a recv_errors counter, so those throws stay
      // outside the read-loop's catch below.
      val code =
        try conn.getResponseCode
        catch {
          case e: java.net.SocketTimeoutException =>
            Metrics.inc("pleiades_recv_errors_total", "type" -> "request_timeout")
            throw e
        }
      if (code != 200) throw new IOException(s"SSE endpoint returned $code")
      try {
        val reader = new BufferedReader(
          new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
        val lines = new Iterator[String] {
          private var line = reader.readLine()
          override def hasNext: Boolean = line != null && !stop()
          override def next(): String = { val l = line; line = reader.readLine(); l }
        }
        // Reference metric names, reference classification (`sse.go:58-84`,
        // SplitN on the two-byte delimiter ": "): a line with NO ": " counts
        // "comment" iff it starts with ':' else "unknown"; a line WITH ": "
        // counts only when its field name is id/event/data — so ": heartbeat"
        // (splits to ["", "heartbeat"]) increments no line counter at all.
        // One recv event per dispatched frame (`sse.go:176-179`).
        val counted = lines.map { l =>
          if (l.nonEmpty) {
            val i = l.indexOf(": ")
            val label =
              if (i < 0) Some(if (l.startsWith(":")) "comment" else "unknown")
              else l.substring(0, i) match {
                case f @ ("id" | "event" | "data") => Some(f)
                case _ => None
              }
            label.foreach(t =>
              Metrics.inc("pleiades_recv_event_lines_total", "type" -> t))
          }
          l
        }
        Sse.assemble(counted).foreach { ev =>
          Metrics.inc("pleiades_recv_events_total")
          onEvent(ev)
        }
        // sse.go:167 — eof means the SERVER closed the stream; a stop()-flag
        // drain is a graceful local shutdown, not a stream error
        if (!stop()) Metrics.inc("pleiades_recv_errors_total", "type" -> "eof")
      } catch {
        case e: java.net.SocketTimeoutException =>
          Metrics.inc("pleiades_recv_errors_total", "type" -> "body_read_timeout")
          throw e
        case e: IOException =>
          Metrics.inc("pleiades_recv_errors_total", "type" -> "read_error")
          throw e
      }
    } finally conn.disconnect()
  }

  /** Running bridge handle: observable counters + graceful stop. */
  final class Handle private[SseBridge] (thread: Thread,
      stopFlag: AtomicBoolean,
      val lastEventId: AtomicReference[String],
      val eventsWritten: AtomicLong,
      val restarts: AtomicLong) {
    def stop(): Unit = {
      stopFlag.set(true)
      thread.interrupt()
      thread.join(10000)
    }
    def isAlive: Boolean = thread.isAlive
  }

  /** Start the long-poll → file-drop loop in a daemon thread. On any error
    * or clean server close it reconnects after `backoffMs`, resuming from
    * the last seen event id (so no event is skipped; the downstream
    * pipeline's event-id dedup absorbs the possible overlap — same
    * at-least-once posture as the reference).
    */
  def start(uri: String, outDir: String, resumeId: String = "",
      backoffMs: Long = 30000, readTimeoutMs: Int = 60000,
      prefix: String = "pleiades"): Handle = {
    Files.createDirectories(Paths.get(outDir))
    val stopFlag = new AtomicBoolean(false)
    val lastId = new AtomicReference[String](resumeId)
    val written = new AtomicLong(0)
    val restarts = new AtomicLong(0)
    val t = new Thread(() => {
      while (!stopFlag.get()) {
        try {
          notify(uri, lastId.get(), ev => {
            if (ev.id.nonEmpty) lastId.set(ev.id)
            writeEvent(outDir, prefix, written.getAndIncrement(), ev)
          }, () => stopFlag.get(), readTimeoutMs)
        } catch { case _: Throwable => () }
        if (!stopFlag.get()) {
          restarts.incrementAndGet()
          // coordinator.go:137 — the SSE consumer restart counter
          Metrics.inc("pleiades_goroutine_restarts", "component" -> "wmf_consumer")
          try Thread.sleep(backoffMs)
          catch { case _: InterruptedException => () }
        }
      }
    }, "sse-bridge")
    t.setDaemon(true)
    t.start()
    new Handle(t, stopFlag, lastId, written, restarts)
  }

  /** One event = one 2-line `.dat` file (`<id>\n<data>`, the reference's
    * file-publisher format, `filepublisher.go:102-104`), written to a temp
    * name and atomically moved so the streaming file source never observes
    * a partial file.
    */
  private def writeEvent(dir: String, prefix: String, seq: Long,
      ev: Sse.SseEvent): Unit =
    try {
      val name = f"$prefix-event-$seq%09d-${System.nanoTime()}%d.dat"
      val tmp = Paths.get(dir, s".$name.tmp")
      Files.writeString(tmp, ev.id + "\n" + ev.data, StandardCharsets.UTF_8)
      Files.move(tmp, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
      Metrics.inc("pleiades_file_publish_events_total") // filepublisher.go:20-24
    } catch {
      case e: Throwable =>
        Metrics.inc("pleiades_file_publish_errors_total")
        throw e
    }
}
