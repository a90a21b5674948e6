package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("lid", "rid").as[(Long, Long)].collect().toSet

  test("overlap join matches naive cross+filter ground truth") {
    // Intervals engineered to hit: boundary touch (end == start), containment,
    // spans over many bins, disjoint, negative coordinates.
    val left = Seq(
      (1L, 0L, 10L), (2L, 5L, 6L), (3L, 31L, 33L), (4L, -20L, -10L),
      (5L, 100L, 400L), (6L, 64L, 64L)
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 10L, 12L), (11L, 7L, 8L), (12L, 0L, 200L), (13L, -15L, -12L),
      (14L, 401L, 500L), (15L, 64L, 70L)
    ).toDF("rid", "rs", "re")

    val got = pairs(RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 8L))
    val want = pairs(left.crossJoin(right)
      .where(col("ls") <= col("re") && col("rs") <= col("le")))
    assert(got == want, s"got $got want $want")
    assert(want.contains((1L, 10L)), "inclusive boundary touch must match")
    assert(want.contains((4L, 13L)), "negative-coordinate intervals must match")
  }

  test("each overlapping pair is emitted exactly once (no distinct needed)") {
    // Both intervals span many shared bins; without the canonical-bin rule
    // the pair would appear once per shared bin.
    val left = Seq((1L, 0L, 100L)).toDF("lid", "ls", "le")
    val right = Seq((2L, 1L, 99L)).toDF("rid", "rs", "re")
    val out = RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 8L)
    assert(out.count() == 1L, "pair must surface exactly once, not per bin")
  }

  test("point-in-interval join matches ground truth") {
    val points = Seq((1L, 5L), (2L, 16L), (3L, 64L), (4L, -3L)).toDF("lid", "p")
    val ivals = Seq((10L, 0L, 10L), (11L, 10L, 20L), (12L, -5L, 70L)).toDF("rid", "is", "ie")
    val got = pairs(RangeJoin.pointInIntervalJoin(points, ivals, "p", "is", "ie", 8L))
    val want = pairs(points.crossJoin(ivals)
      .where(col("p") >= col("is") && col("p") <= col("ie")))
    assert(got == want, s"got $got want $want")
  }

  test("auto bin width: skewed lengths pick the median, results unchanged") {
    // Heavily skewed widths: many short intervals (len 4-6) plus a few huge
    // ones (len 5000). A naive caller who never thinks about bin width used
    // to be one degenerate choice away from a len/width+1 explosion; the
    // auto width must land at the MEDIAN (short) length, not the mean the
    // outliers drag up, and never below 1.
    val short = (0L until 200L).map(i => (i, i * 10L, i * 10L + 4L + (i % 3)))
    val huge = (200L until 204L).map(i => (i, i * 10L, i * 10L + 5000L))
    val left = (short ++ huge).toDF("lid", "ls", "le")
    val right = (short ++ huge).map { case (i, s, e) => (i + 1000L, s, e) }
      .toDF("rid", "rs", "re")
    val w = RangeJoin.autoBinWidth(left, "ls", "le", right, "rs", "re")
    assert(w >= 4L && w <= 6L, s"median short length expected, got $w")

    // correctness is width-invariant: auto == explicit == naive
    val auto = pairs(RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re"))
    val explicit = pairs(RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", 8L))
    val naive = pairs(left.crossJoin(right)
      .where(col("ls") <= col("re") && col("rs") <= col("le")))
    assert(auto == naive && explicit == naive && naive.nonEmpty)

    // degenerate all-points input (every length 0) still yields a legal width
    val pts = Seq((1L, 5L, 5L), (2L, 9L, 9L)).toDF("lid", "ls", "le")
    assert(RangeJoin.autoBinWidth(pts, "ls", "le",
      pts.toDF("rid", "rs", "re"), "rs", "re") == 1L)

    // point-in-interval: the interval side alone votes; auto == explicit
    val points = Seq((1L, 5L), (2L, 16L), (3L, 2001L)).toDF("pid", "p")
    val ivals = Seq((10L, 0L, 10L), (11L, 10L, 20L), (12L, 2000L, 2002L))
      .toDF("iid", "is", "ie")
    val gotAuto = RangeJoin.pointInIntervalJoin(points, ivals, "p", "is", "ie")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val gotExp = RangeJoin.pointInIntervalJoin(points, ivals, "p", "is", "ie", 8L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(gotAuto == gotExp && gotAuto.nonEmpty)
  }

  test("property: random interval sets always equal the naive join, any bin width") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genIval = for {
      s <- Gen.choose(-200L, 200L)
      len <- Gen.choose(0L, 120L)
    } yield (s, s + len)
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 5).foreach { round =>
      val seed = Seed(round.toLong)
      def sample(n: Int, s: Seed) =
        Gen.listOfN(n, genIval).pureApply(params, s)
      val ls = sample(40, seed).zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      val rs = sample(30, seed.next).zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      val left = ls.toDF("lid", "ls", "le")
      val right = rs.toDF("rid", "rs", "re")
      val width = 1L << (round % 4 + 1) // 2, 4, 8, 16, 2
      val got = pairs(RangeJoin.overlapJoin(left, right, "ls", "le", "rs", "re", width))
      val want = pairs(left.crossJoin(right)
        .where(col("ls") <= col("re") && col("rs") <= col("le")))
      assert(got == want, s"round $round width $width: got ${got.size} want ${want.size}")
    }
  }

  test("plan is an equi-join on the bin id, not a product") {
    val epoch = lit("1970-01-01").cast("date")
    val w = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("window_id"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("ws"))
      .withColumn("we", col("ws") + 29L)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        datediff(col("l_shipdate").cast("date"), epoch).cast("long").as("ls"))
      .withColumn("le", col("ls") + 5L)
    val plan = RangeJoin.overlapJoin(li, w, "ls", "le", "ws", "we", 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"range join must not plan a product:\n$plan")
  }

  test("auto bin width on empty/all-null inputs returns empty, not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("lid", "ls", "le")
    val emptyR = Seq.empty[(Long, Long, Long)].toDF("rid", "rs", "re")
    // binWidth = 0 (auto) must behave like any explicit width here: an
    // empty result, not a NullPointerException from the null percentile.
    assert(RangeJoin.overlapJoin(empty, emptyR, "ls", "le", "rs", "re").count() == 0L)
    val allNull = Seq((1L, null.asInstanceOf[java.lang.Long],
      null.asInstanceOf[java.lang.Long])).toDF("lid", "ls", "le")
    assert(RangeJoin.overlapJoin(allNull,
      allNull.toDF("rid", "rs", "re"), "ls", "le", "rs", "re").count() == 0L)
  }
}
