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

  test("mergeIntervals: overlap, touching, contained, singleton, per-key") {
    // key 1: [0,10] ∪ [5,20] overlap → [0,20]; [20,25] touches (closed
    // intervals share point 20) → extends to [0,25]; [30,40] disjoint;
    // [32,35] contained → absorbed. key 2 must merge independently.
    val in = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 25L), (1L, 30L, 40L),
      (1L, 32L, 35L), (2L, 100L, 100L)
    ).toDF("k", "s", "e")
    val got = RangeJoin.mergeIntervals(in, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 25L), (1L, 30L, 40L), (2L, 100L, 100L)),
      s"got $got")
  }

  test("mergeIntervals: merged set covers the same points, disjointly") {
    // Randomized ground truth: point p is covered by key k's merged set
    // iff it was covered by some raw interval — and by EXACTLY ONE merged
    // interval (the disjointness downstream exactly-once counting needs).
    val rnd = new scala.util.Random(7)
    val raw = (0 until 300).map { i =>
      val s = rnd.nextInt(200).toLong; (rnd.nextInt(4).toLong, s, s + rnd.nextInt(30))
    }
    val merged = RangeJoin.mergeIntervals(raw.toDF("k", "s", "e"), "k", "s", "e")
      .as[(Long, Long, Long)].collect()
    for (k <- 0L until 4L; p <- 0L until 240L) {
      val inRaw = raw.exists { case (rk, s, e) => rk == k && s <= p && p <= e }
      val hits = merged.count { case (mk, s, e) => mk == k && s <= p && p <= e }
      assert(hits == (if (inRaw) 1 else 0), s"k=$k p=$p hits=$hits inRaw=$inRaw")
    }
  }

  test("mergeIntervals: null-bounded intervals are dropped, not merged") {
    val in = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 0L, 10L), (1L, null, 50L), (1L, 60L, null), (3L, null, null)
    ).toDF("k", "s", "e")
    val got = RangeJoin.mergeIntervals(in, "k", "s", "e")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 10L)), s"got $got")
  }

  test("mergeIntervals plans ONE exchange: the group-by reuses the window's") {
    // The window's hash-by-key partitioning already clusters (key, group),
    // so the min/max aggregate must not add a second shuffle — the
    // operator's whole cost model rests on this.
    val in = Seq((1L, 0L, 10L), (1L, 5L, 20L), (2L, 7L, 9L)).toDF("k", "s", "e")
    val plan = RangeJoin.mergeIntervals(in, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }

  test("rq29: union path and default path are result-identical") {
    // The size gate chooses between these two plans at runtime; the
    // contract is that the choice is invisible in the output. Pin both
    // branches explicitly and compare full contents on the sf0.001 tables.
    def rows(u: Boolean) =
      graft.queries.RelationalQueries.rq29Plan(spark, sf, Some(u))
        .as[(Long, Long, Long, Long)].collect().toSeq
    val defaultPath = rows(false)
    val unionPath = rows(true)
    assert(defaultPath.nonEmpty, "rq29 must produce windows at sf0.001")
    assert(defaultPath == unionPath,
      s"paths diverge: default=${defaultPath.take(3)} union=${unionPath.take(3)}")
  }
}
