package graft

import java.nio.file.{Files, Paths}

/** CLI personality spec: the aggregate personality drains a fixture
  * file-drop directory end-to-end (reference `aggregator_cmd.go` shape) and
  * the option parser fails loudly on missing/unknown input. The ingest and
  * frontend personalities are thin mains over SseBridge / QueryApi, which
  * carry their own live specs (SseBridgeSpec, QueryApiSpec, SoakSpec).
  */
class CliSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate personality: file-drop fixtures -> counter store") {
    val events = Files.createTempDirectory("graft-cli-ev")
    val table = Files.createTempDirectory("graft-cli-agg").toString
    val ckpt = Files.createTempDirectory("graft-cli-ckpt").toString
    val day0 = 18489L
    (1 to 5).foreach { i =>
      val key = s"""[{"topic":"x","partition":0,"timestamp":${(day0 * 86400 + i) * 1000}}]"""
      val value = s"""{"id":$i,"wiki":"enwiki","type":"edit","bot":false,"minor":false,""" +
        s""""timestamp":${day0 * 86400 + i},"meta":{"id":"u-$i","dt":"x","stream":"rc"}}"""
      Files.write(Paths.get(events.toString, f"ev-$i%05d.dat"),
        s"$key\n$value".getBytes("UTF-8"))
    }
    // --available-now passed BARE and mid-list (the documented usage):
    // the parser must treat it as a presence flag without misaligning the
    // options that follow it.
    val code = Cli.run(Array("aggregate", "--events", events.toString,
      "--available-now", "--table", table, "--checkpoint", ckpt), spark)
    assert(code == 0)
    val total = graft.streaming.CounterTable.read(spark, table)
      .where($"day" === day0 && $"counter" === "total")
      .select("n").as[Long].head()
    assert(total == 5L)
  }

  test("option parser: missing required option fails loudly") {
    val e = intercept[RuntimeException] {
      Cli.run(Array("ingest", "--dir", "/tmp/x"), spark)
    }
    assert(e.getMessage.contains("--uri"))
    assert(Cli.run(Array("bogus"), spark) == 2)
  }
}
