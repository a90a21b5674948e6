package graft

import graft.streaming.{CounterPipeline, Observability}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("progress recorder captures batch rows and watermark") {
    val recorder = Observability.attach(spark)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = CounterPipeline.start(spark, stream.toDF().toDF("key", "value"),
      Files.createTempDirectory("obs-agg").toString,
      Files.createTempDirectory("obs-ckpt").toString,
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(
        ("[{\"timestamp\":1597449600000}]",
          """{"wiki":"enwiki","type":"edit","timestamp":1597449600}"""))
      q.processAllAvailable()
      // listener events are async; allow a moment to drain
      val deadline = System.currentTimeMillis() + 10000
      while (recorder.snapshot.forall(_.numInputRows == 0) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val withRows = recorder.snapshot.filter(_.numInputRows > 0)
      assert(withRows.nonEmpty, s"no progress captured: ${recorder.snapshot}")
      assert(withRows.head.numInputRows == 1L)
      assert(recorder.toDF(spark).columns.contains("watermark"))
    } finally {
      q.stop()
      spark.streams.removeListener(recorder)
    }
  }
}
