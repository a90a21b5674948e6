package graft

import graft.operators.CounterDerivation
import graft.streaming.Recentchange
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the fan-out invariants (SURVEY §5 plan item 4):
  * over arbitrary event batches — every event contributes exactly one
  * `total`; `length_inc`+`length_dec` ≤ total; per-day roll-up equals
  * all-time. (Plain ScalaCheck Gen sampled over fixed seeds — the
  * scalatest-scalacheck bridge isn't in the dependency set.)
  */
class CounterPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genEvent: Gen[String] = for {
    wiki <- Gen.oneOf("", "enwiki", "dewiki", "hewiktionary")
    typ <- Gen.oneOf("", "edit", "new", "log")
    bot <- Gen.oneOf(true, false)
    minor <- Gen.oneOf(true, false)
    ts <- Gen.choose(1597000000L, 1598000000L)
    hasLen <- Gen.oneOf(true, false)
    old <- Gen.choose(0L, 1000L)
    nw <- Gen.choose(0L, 1000L)
  } yield {
    val len = if (hasLen) s""","length":{"old":$old,"new":$nw}""" else ""
    s"""{"wiki":"$wiki","type":"$typ","bot":$bot,"minor":$minor,"timestamp":$ts$len}"""
  }

  test("fan-out invariants hold for arbitrary event batches") {
    (1 to 5).foreach { trial =>
      val events = Gen.listOfN(40, genEvent)
        .apply(Gen.Parameters.default, Seed(trial.toLong)).get
      val msgs = events.map(e => ("[{\"timestamp\":1597000000000}]", e))
        .toDF("key", "value")
      val fan = CounterDerivation.forRecentchange(Recentchange.parse(msgs)).cache()
      try {
        val byCounter = fan.groupBy("counter").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // exactly one 'total' per event
        assert(byCounter.getOrElse("total", 0L) == events.size.toLong,
          s"trial $trial: $byCounter")
        // inc + dec can't exceed total (only length-bearing events emit one)
        assert(byCounter.getOrElse("length_inc", 0L) +
          byCounter.getOrElse("length_dec", 0L) <= events.size.toLong)
        // per-day roll-up == all-time
        val daily = fan.groupBy("day", "counter").count()
        val rolled = CounterDerivation.allTimeCounters(
          daily.withColumnRenamed("count", "n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(rolled == byCounter, s"trial $trial roll-up mismatch")
      } finally fan.unpersist()
    }
  }
}
