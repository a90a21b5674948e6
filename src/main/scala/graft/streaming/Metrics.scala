package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import java.util.concurrent.atomic.LongAdder

/** Reference-metric-name parity registry (S12): process-wide counters
  * carrying the reference's EXACT Prometheus metric and label names —
  * `pleiades_recv_events_total` (`pkg/ingester/sse/sse.go:30-33`),
  * `pleiades_recv_event_lines_total{type}` (`sse.go:34-39`),
  * `pleiades_recv_errors_total{type}` (`sse.go:40-45`),
  * `pleiades_goroutine_restarts{component}` (`pkg/ingester/coordinator.go:24-29`),
  * `pleiades_file_publish_events_total` / `_errors_total`
  * (`pkg/ingester/publisher/file/filepublisher.go:20-30`) — so the
  * reference's Grafana `dashboard.json` panels port against [[QueryApi]]'s
  * `/metrics` unchanged. Producers ([[graft.sources.SseBridge]], the web
  * handlers) increment here; [[QueryApi.metricsText]] renders the registry
  * into the exposition body.
  *
  * Counters only (the reference's remaining gauges instrument its Kafka
  * client internals — S3/S6's environment-closed surface). A plain
  * LongAdder map keyed by (metric, rendered-labels): label cardinality is
  * bounded by construction (fixed type/component enums), matching the
  * reference's pre-registered vectors.
  */
object Metrics {

  private val help = Map(
    "pleiades_recv_events_total" -> "The total number of events received",
    "pleiades_recv_event_lines_total" -> "Total numbers of lines read from server",
    "pleiades_recv_errors_total" -> "Total numbers of errors encountered during events receive",
    "pleiades_goroutine_restarts" -> "Total numbers of restarts of component goroutines",
    "pleiades_file_publish_events_total" -> "The total number of events published to file",
    "pleiades_file_publish_errors_total" -> "Total numbers of errors encountered while publishing to file")

  private val counters =
    new ConcurrentHashMap[(String, Seq[(String, String)]), LongAdder]

  def inc(name: String, labels: (String, String)*): Unit =
    counters.computeIfAbsent((name, labels.toSeq), _ => new LongAdder).increment()

  /** Snapshot for specs. */
  def value(name: String, labels: (String, String)*): Long =
    Option(counters.get((name, labels.toSeq))).map(_.sum).getOrElse(0L)

  /** Test isolation — the reference process restarts to zero its registry. */
  def reset(): Unit = counters.clear()

  /** Render every touched metric in Prometheus text exposition format. */
  def renderInto(sb: StringBuilder): Unit = {
    val byMetric = counters.asScala.toSeq.groupBy(_._1._1)
    byMetric.toSeq.sortBy(_._1).foreach { case (name, entries) =>
      sb ++= s"# HELP $name ${help.getOrElse(name, name)}\n"
      sb ++= s"# TYPE $name counter\n"
      entries.sortBy(_._1._2.toString).foreach { case ((_, labels), n) =>
        val ls =
          if (labels.isEmpty) ""
          else labels.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ",", "}")
        sb ++= s"$name$ls ${n.sum}\n"
      }
    }
  }
}
