package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Streaming observability — the reference's Prometheus surface (T8,
  * `pkg/aggregator/aggregator.go:69-76` processing-lag histogram;
  * `prometheus.go` publish gauges) re-expressed as a
  * `StreamingQueryListener`: per-batch input rows, processing duration, and
  * event-time watermark lag, queryable as a DataFrame for dashboards.
  */
final case class BatchProgress(
    queryName: String, batchId: Long, numInputRows: Long,
    durationMs: Long, watermark: String, tsMs: Long)

final class ProgressRecorder extends StreamingQueryListener {
  private val buf = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.add(BatchProgress(
      Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      Option(p.eventTime.get("watermark")).getOrElse(""),
      p.timestamp match { case null => 0L; case _ => java.time.Instant.parse(p.timestamp).toEpochMilli }))
  }

  def snapshot: Seq[BatchProgress] = buf.asScala.toSeq

  /** Progress history as a DataFrame (the dashboard-facing view). */
  def toDF(spark: SparkSession) = {
    import spark.implicits._
    snapshot.toDF()
  }
}

object Observability {
  /** Install a recorder on the session; returns it for querying. */
  def attach(spark: SparkSession): ProgressRecorder = {
    val r = new ProgressRecorder
    spark.streams.addListener(r)
    r
  }
}
