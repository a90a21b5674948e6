package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SSE (`text/event-stream`) frame handling — the reference's ingest wire
  * format (S1/S2 in SURVEY §2.1).
  *
  * The reference's line parser (`pkg/ingester/sse/sse.go:58-84`) tokenizes
  * `id:` / `event:` / `data:` lines, skips `:comment` lines, joins multiple
  * `data:` lines with `\n`, and emits the accumulated event at each blank
  * line (`sse.go:176-183`). Frame assembly is inherently sequential within a
  * capture, so it runs as a per-partition linear pass (`mapPartitions`) over
  * ordered capture lines — one partition per capture file/stream shard,
  * which is exactly the parallelism the wire format admits (the reference
  * runs exactly 1 ingester, README.md:28-29; we parallelize across captures).
  *
  * Live ingestion at scale uses the same code behind a tiny SSE→Kafka bridge
  * process; the engine then consumes Kafka (CounterPipeline.fromKafka).
  */
object Sse {

  /** One assembled SSE event frame. */
  final case class SseEvent(id: String, event: String, data: String)

  /** Assemble frames from the raw lines of one capture (in order). */
  def assemble(lines: Iterator[String]): Iterator[SseEvent] = {
    var id = ""
    var event = ""
    var data: List[String] = Nil
    new Iterator[SseEvent] {
      private var nextEv: SseEvent = _
      private def advance(): Unit = {
        nextEv = null
        while (nextEv == null && lines.hasNext) {
          val line = lines.next()
          if (line.isEmpty) { // blank line = dispatch accumulated event
            if (data.nonEmpty || id.nonEmpty || event.nonEmpty) {
              nextEv = SseEvent(id, event, data.reverse.mkString("\n"))
              id = ""; event = ""; data = Nil
            }
          } else if (line.startsWith(":")) {
            // comment line (e.g. ":ok") — skipped, sse.go:60-62
          } else if (line.startsWith("id: ")) {
            id = line.substring(4)
          } else if (line.startsWith("event: ")) {
            event = line.substring(7)
          } else if (line.startsWith("data: ")) {
            data = line.substring(6) :: data
          } // unknown fields ignored (permissive, like the reference)
        }
      }
      advance()
      override def hasNext: Boolean = nextEv != null
      override def next(): SseEvent = { val e = nextEv; advance(); e }
    }
  }

  /** Batch/replay entry: each input row = (capture, line_no, line); frames
    * are assembled per capture in line order and returned as (key, value)
    * messages ready for Recentchange.parse / CounterPipeline.
    */
  def assembleCaptures(spark: SparkSession, lines: DataFrame): DataFrame = {
    import spark.implicits._
    lines.select(col("capture"), col("line_no"), col("line"))
      .repartition(col("capture"))
      .sortWithinPartitions("capture", "line_no")
      .as[(String, Long, String)]
      .mapPartitions { (it: Iterator[(String, Long, String)]) =>
        // Rows arrive sorted by (capture, line_no); feed each capture's
        // line run through the incremental assembler WITHOUT buffering the
        // partition (constant memory per in-flight frame, so arbitrarily
        // large captures stream through).
        // NB: named `rows`, not `buffered` — Iterator has an inherited
        // `buffered` member that would shadow the val inside the anonymous
        // iterators below.
        val rows = it.buffered
        new Iterator[SseEvent] {
          private var run: Iterator[SseEvent] = Iterator.empty
          private def advanceRun(): Unit =
            if (rows.hasNext) {
              val cap = rows.head._1
              run = assemble(new Iterator[String] {
                override def hasNext: Boolean =
                  rows.hasNext && rows.head._1 == cap
                override def next(): String = rows.next()._3
              })
            }
          override def hasNext: Boolean = {
            while (!run.hasNext && rows.hasNext) advanceRun()
            run.hasNext
          }
          override def next(): SseEvent = { hasNext; run.next() }
        }
      }
      .toDF()
      .select(col("id").as("key"), col("data").as("value"), col("event"))
  }

  /** Read one capture file (verbatim `text/event-stream` bytes on disk) as
    * the (capture, line_no, line) shape assembleCaptures expects.
    */
  def readCaptureFile(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "\n").text(path)
      .select(lit(path).as("capture"),
        monotonically_increasing_id().as("line_no"), col("value").as("line"))
}
