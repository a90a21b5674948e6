package graft

import graft.streaming.{CounterPipeline, CounterStore, Observability, QueryApi}
import org.apache.spark.sql.streaming.Trigger

/** Unified CLI — the reference's three process personalities
  * (`cmd/main.go:28-77`, `ingest_cmd.go`, `aggregator_cmd.go`,
  * `frontend_cmd.go`) re-expressed over the Spark-first components:
  *
  *   graft ingest    --uri <sse> --dir <events> [--resume-id <id>] [--seconds n]
  *   graft aggregate --events <dir> --table <dir> --checkpoint <dir>
  *                   [--seconds n | --available-now]
  *   graft frontend  --table <dir> [--port n] [--seconds n] [--static <dir>]
  *   graft soak      --seconds n --events <dir> --table <dir> --checkpoint <dir>
  *                   [--uri <sse>]
  *
  * ingest = the SSE long-poll coordinator publishing one 2-line `.dat`
  * file per event (the reference's file publisher; Kafka publishing is the
  * same `messageFrame` behind `EventFiles.toKafka`, see COVERAGE S3).
  * aggregate = the streaming counter pipeline with checkpoint resume.
  * frontend = the REST/metrics API over the aggregate store.
  * `--seconds` bounds a run for scripted use; omitted means run until
  * killed (the production posture; checkpoints make restarts resume).
  */
object Cli {

  /** `--key value` pairs plus bare presence flags: a `--flag` followed by
    * another `--option` (or by nothing) maps to "true", so `--available-now`
    * works bare anywhere in the argument list.
    */
  private def opts(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case k :: v :: tail if k.startsWith("--") && !v.startsWith("--") =>
          loop(tail, acc + (k.drop(2) -> v))
        case k :: tail if k.startsWith("--") =>
          loop(tail, acc + (k.drop(2) -> "true"))
        case _ :: tail => loop(tail, acc)
        case Nil => acc
      }
    loop(args.toList, Map.empty)
  }

  private def req(o: Map[String, String], k: String): String =
    o.getOrElse(k, sys.error(s"missing required option --$k"))

  /** Exit code of one personality run; session lifecycle belongs to
    * [[main]] (tests pass the shared session and keep it).
    */
  def run(args: Array[String],
      session: => org.apache.spark.sql.SparkSession): Int = args.headOption match {
    case Some("ingest") =>
      val o = opts(args.tail)
      val bridge = sources.SseBridge.start(req(o, "uri"), req(o, "dir"),
        resumeId = o.getOrElse("resume-id", ""))
      sys.addShutdownHook {
        bridge.stop()
        println(s"ingest shutdown; events=${bridge.eventsWritten.get()} " +
          s"last-event-id=${bridge.lastEventId.get()}")
      }
      o.get("seconds") match {
        case Some(s) => Thread.sleep(s.toLong * 1000); bridge.stop()
        case None => while (bridge.isAlive) Thread.sleep(1000)
      }
      0

    case Some("aggregate") =>
      val o = opts(args.tail)
      val spark = session
      Observability.attach(spark)
      val messages = CounterPipeline.fromFileDrop(spark, req(o, "events"),
        maxFilesPerTrigger = 10000)
      val availableNow = o.contains("available-now")
      val trigger =
        if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime("5 seconds")
      val q = CounterPipeline.start(spark, messages, req(o, "table"),
        req(o, "checkpoint"), trigger = trigger)
      (o.get("seconds"), availableNow) match {
        case (_, true) => q.awaitTermination() // AvailableNow ends on drain
        case (Some(s), _) => Thread.sleep(s.toLong * 1000); q.stop()
        case (None, _) => q.awaitTermination()
      }
      0

    case Some("frontend") =>
      val o = opts(args.tail)
      // --static <dir>: mount the SPA build at "/" (frontend.go:42)
      val api = new QueryApi(new CounterStore(session, req(o, "table")),
        staticDir = o.get("static"))
      val port = api.start(o.getOrElse("port", "0").toInt)
      println(s"frontend serving on port $port")
      o.get("seconds") match {
        case Some(s) => Thread.sleep(s.toLong * 1000); api.stop()
        case None => while (true) Thread.sleep(1000)
      }
      0

    case Some("soak") =>
      val o = opts(args.tail)
      val report = StreamDemo.soak(session, req(o, "events"), req(o, "table"),
        req(o, "checkpoint"), req(o, "seconds").toLong, o.get("uri"))
      println(s"=== soak report ===\n$report")
      if (report.twinMatches) 0 else 1

    case other =>
      System.err.println(
        s"""unknown command: ${other.getOrElse("<none>")}
           |usage: graft ingest|aggregate|frontend|soak [options]""".stripMargin)
      2
  }

  def main(args: Array[String]): Unit = {
    lazy val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), s"graft-${args.headOption.getOrElse("cli")}")
    val code = run(args, spark)
    if (Set("aggregate", "frontend", "soak").contains(args.headOption.getOrElse("")))
      spark.stop()
    if (code != 0) sys.exit(code)
  }
}
