package graft

import graft.operators.{Sampling, Similarity}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: k per stratum, deterministic across repartitions") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val s1 = Sampling.stratifiedDeterministic(docs, "lang", "doc_id", 5)
      .orderBy("lang", "doc_id").collect().toSeq
    val s2 = Sampling.stratifiedDeterministic(docs.repartition(7), "lang", "doc_id", 5)
      .orderBy("lang", "doc_id").collect().toSeq
    assert(s1 == s2)
    val perLang = s1.groupBy(_.getString(1)).map { case (_, rs) => rs.size }
    assert(perLang.forall(_ <= 5) && perLang.nonEmpty)
  }

  test("sequence packing: bins respect capacity starts and cover all docs") {
    val df = Seq((1L, 1000L), (2L, 2000L), (3L, 1500L), (4L, 100L), (5L, 4000L))
      .toDF("doc_id", "n_tokens")
    val packed = Sampling.packSequences(df, "doc_id", "n_tokens", capacity = 4096L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // cumulative starts: 0, 1000, 3000, 4500, 4600 -> bins 0,0,0,1,1
    assert(packed.map(_._3) == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("sequence packing matches the sequential scan on real docs") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val got = Sampling.packSequences(docs, "doc_id", "n", capacity = 4096L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // Sequential single-threaded reference scan.
    val rows = docs.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    var cum = 0L
    val expected = rows.map { case (id, n) =>
      val bin = cum / 4096L; cum += n; (id, n, bin)
    }
    assert(got == expected)
  }

  test("sequence packing plan: no single-partition window over the data") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val packed = Sampling.packSequences(docs, "doc_id", "n", capacity = 4096L)
    val plan = packed.queryExecution.optimizedPlan.toString
    // The row-level cumsum must be partitioned by _pid; the only allowed
    // global window is the prefix sum over the per-partition totals
    // (ordered by _pid, metadata scale). A partition-less window ordered by
    // the data's id column is the single-task scan this fix removes.
    assert("windowspecdefinition\\(_pid#\\d+L?, doc_id#\\d+L? ASC".r
        .findFirstIn(plan).isDefined,
      s"expected the cumsum window partitioned by _pid in:\n$plan")
    assert("windowspecdefinition\\(doc_id#\\d+L? ASC".r.findFirstIn(plan).isEmpty,
      s"found an unpartitioned window over doc rows in:\n$plan")
  }

  test("weighted mix: ratios hold, deterministic, full-keep and zero-keep") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val fr = Map("src0" -> 1.0, "src1" -> 0.5)
    val kept = Sampling.weightedMix(docs, "source", "doc_id", fr,
      defaultFraction = 0.0)
    val bySource = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") == totals("src0"), "fraction 1.0 keeps everything")
    assert(bySource.keySet == Set("src0", "src1"), "default 0.0 drops the rest")
    val f1 = bySource("src1").toDouble / totals("src1")
    assert(f1 > 0.2 && f1 < 0.8, s"src1 keep fraction $f1 wildly off 0.5")
    // Deterministic under repartition.
    val again = Sampling.weightedMix(docs.repartition(7), "source", "doc_id", fr)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("ntileExact equals a sequential NTILE for awkward N/k splits") {
    // N=8, k=5 is the case where floor(rank*k/N) diverges from SQL NTILE
    // (2,2,1,2,1 vs the standard 2,2,2,1,1) — pin the standard behavior.
    val df = (1L to 8L).map(i => (i, i * 7 % 5)).toDF("id", "v")
    for (k <- Seq(1, 3, 5, 8, 11)) {
      val got = Sampling.ntileExact(df, Seq("v"), "id", k)
        .orderBy("v", "id").select("bucket").as[Long].collect().toSeq
      val n = 8
      val q = n / k; val r = n % k
      val expected = (0 until n).map { r0 =>
        if (r0 < (q + 1) * r) r0 / (q + 1) + 1 else r + (r0 - (q + 1) * r) / q + 1
      }.map(_.toLong)
      assert(got == expected, s"k=$k")
      // tile sizes differ by at most 1 and larger tiles come first
      val sizes = got.groupBy(identity).toSeq.sortBy(_._1).map(_._2.size)
      assert(sizes.reverse == sizes.sorted, s"k=$k sizes $sizes")
    }
  }

  test("ntileExact is repartition-stable and covers every row on real docs") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val a = Sampling.ntileExact(docs, Seq("n"), "doc_id", 8)
      .orderBy("doc_id").collect().toSeq
    val b = Sampling.ntileExact(docs.repartition(13), Seq("n"), "doc_id", 8)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == docs.count())
    val sizes = a.groupBy(_.getLong(2)).values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1, s"uneven tiles: $sizes")
  }

  test("context windows: window totals, per-doc coverage, sequential equality") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val w = 512L
    val got = Sampling.contextWindows(docs, "doc_id", "n", w)
      .orderBy("doc_id", "window_id").as[(Long, Long, Long)].collect().toSeq
    // Every window except the last is exactly full.
    val byWindow = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val lastWindow = byWindow.keys.max
    byWindow.foreach { case (win, tot) =>
      if (win != lastWindow) assert(tot == w, s"window $win holds $tot tokens")
      else assert(tot <= w && tot > 0, s"last window holds $tot")
    }
    // Every doc's tokens are fully assigned.
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val sizes = docs.as[(Long, Long)].collect().toMap
    sizes.foreach { case (id, n) =>
      assert(byDoc.getOrElse(id, 0L) == n, s"doc $id covered wrong")
    }
    // Sequential single-threaded reference.
    var cum = 0L
    val expected = docs.orderBy("doc_id").as[(Long, Long)].collect().toSeq
      .flatMap { case (id, n) =>
        val start = cum; cum += n
        (start / w to (cum - 1) / w).map { win =>
          (id, win, math.min(cum, (win + 1) * w) - math.max(start, win * w))
        }
      }
    assert(got == expected)
    // Repartition-stable.
    val again = Sampling.contextWindows(docs.repartition(9), "doc_id", "n", w)
      .orderBy("doc_id", "window_id").as[(Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("temperature mix: integer targets, upweighted tail, deterministic") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val total = 200L
    val got = Sampling.temperatureMix(docs, "lang", "doc_id", total, alpha = 0.5)
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Expected targets from the same exact integer arithmetic.
    val s = counts.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val stot = s.values.sum
    val expTargets = s.view.mapValues(v => total * v / stot).toMap
    val gotBy = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotBy == expTargets.filter(_._2 > 0))
    assert(gotBy.values.sum <= total)
    // alpha < 1 flattens: the head stratum's sample share sits below its
    // corpus share, the smallest stratum's above.
    val (head, tail) = (counts.maxBy(_._2)._1, counts.minBy(_._2)._1)
    val corpusN = counts.values.sum.toDouble
    val sampleN = gotBy.values.sum.toDouble
    assert(gotBy(head) / sampleN < counts(head) / corpusN, "head not downweighted")
    assert(gotBy(tail) / sampleN > counts(tail) / corpusN, "tail not upweighted")
    // Deterministic under repartition.
    val again = Sampling.temperatureMix(docs.repartition(7), "lang", "doc_id",
      total, alpha = 0.5).select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted sample favors heavy rows and is repartition-stable") {
    // Two weight classes: heavy rows 100x the weight of light rows must
    // dominate a small sample from a 50/50 population.
    val rows = (1L to 1000L).map(i => (i, if (i <= 500) 1000L else 10L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(rows, "id", "w", m = 100)
      .select("id").as[Long].collect().toSet
    val heavy = got.count(_ <= 500)
    assert(heavy >= 85, s"heavy rows must dominate, got $heavy/100")
    // Without replacement: distinct ids, exactly m of them.
    assert(got.size == 100)
    val again = Sampling.weightedSample(rows.repartition(7), "id", "w", m = 100)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("weighted sample fails loudly on non-positive weights") {
    val bad = Seq((1L, 5L), (2L, -3L), (3L, 2L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, "id", "w", m = 2).collect()
    }
    assert(e.getMessage.contains("non-positive weight"),
      s"expected the weight-contract error, got: ${e.getMessage}")
    val zero = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    intercept[Exception] {
      Sampling.weightedSample(zero, "id", "w", m = 1).collect()
    }
  }

  test("temperature mix targets survive huge totals (no Long wrap)") {
    // total * _s would overflow Long for totals near 2^63 / _s; the
    // DECIMAL(38,0) product must keep targets exact and non-negative.
    val df = (1L to 100L).map(i => (if (i <= 90) "big" else "small", i))
      .toDF("src", "id")
    val total = 2000000000000000L // 2e15: wraps in Long against _s ~ 9.5e6
    val t = Sampling.temperatureMix(df, "src", "id", total, alpha = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // All 100 rows survive (targets >> n); a wrapped product would have
    // produced negative targets and dropped everything.
    assert(t.getOrElse("big", 0L) == 90L && t.getOrElse("small", 0L) == 10L)
  }

  test("multiprobe LSH recall >= single-probe recall") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val single = Similarity.lshTopK(emb, "embedding", "vec_id", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val multi = Similarity.lshTopKMultiprobe(emb, "embedding", "vec_id", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert((exact & multi).size >= (exact & single).size)
    assert(single.subsetOf(multi) || multi.size >= single.size)
  }

  test("leakage-free split keeps every near-dup group on one side") {
    val docs = Tables.documents(spark, sf)
    val split = Sampling.leakageFreeSplit(docs, "text", "doc_id")
    // no group straddles the boundary
    val straddlers = split.groupBy("group_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("sides"))
      .where(org.apache.spark.sql.functions.col("sides") > 1)
    assert(straddlers.count() == 0, "a near-dup group crossed the split")
    // both sides exist and every doc is assigned
    assert(split.count() == docs.count())
    val sides = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(sides == Set("train", "test"))
    // deterministic under repartition
    val again = Sampling.leakageFreeSplit(docs.repartition(11), "text", "doc_id")
    assert(split.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("token-budget waterfill: caps bind, surplus re-flows, budget holds") {
    import spark.implicits._
    // hand corpus: three sources, 10 tokens each; src_a weighted 8x wants
    // far more than its 2-epoch cap (20), so its surplus must waterfall
    // to the light sources round by round
    val docs = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c"))
      .zipWithIndex.map { case (s, i) =>
        (i.toLong, "t t t t t t t t t t".take(19), s"src_$s")
      }.toDF("doc_id", "text", "source")
    val plan = Sampling.tokenBudgetMix(docs, "text", "source",
      budget = 120L, maxEpochs = 2L, weights = Map("src_a" -> 8L))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
    val bySrc = plan.map(r => r._1 -> r).toMap
    // availability: 10 docs x 10 tokens = 100; cap = 200 each
    assert(plan.forall(r => r._2 == 100L && r._4 == 200L))
    // round 0 shares (sumW=10): a=96, b=12, c=12 — none capped yet; the
    // 120-token budget allocates fully (integer dust = 0 here)
    assert(plan.map(_._5).sum == 120L)
    assert(bySrc("src_a")._5 == 96L && bySrc("src_b")._5 == 12L)
    assert(plan.forall(!_._7), "no source reaches 2 epochs at this budget")

    // a budget past capacity caps EVERY source at exactly maxEpochs
    val capped = Sampling.tokenBudgetMix(docs, "text", "source",
      budget = 10000L, maxEpochs = 2L, weights = Map("src_a" -> 8L))
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(capped.forall(r => r._5 == 200L && r._6 == 2.0 && r._7))

    // mid budget: the heavy source caps, its surplus flows to the others
    val mid = Sampling.tokenBudgetMix(docs, "text", "source",
      budget = 450L, maxEpochs = 2L, weights = Map("src_a" -> 8L))
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(mid("src_a")._7 && mid("src_a")._5 == 200L,
      "heavy source must cap at 2 epochs")
    assert(mid("src_b")._5 > 45L,
      "light sources must receive the capped source's surplus " +
        s"(round-0 share was 45, got ${mid("src_b")._5})")
    // never over budget, never over cap
    assert(mid.values.map(_._5).sum <= 450L)
  }

  test("token-budget waterfill: zero-token source gets 0.0 epochs, not NaN") {
    import spark.implicits._
    // src_empty contributes only null texts -> 0 available tokens. It must
    // read as capped (cap 0) with epochs 0.0, and its weight must leave the
    // waterfill so the full budget lands on the real source.
    val docs = Seq(
      (0L, "t t t t t t t t t t", "src_real"),
      (1L, null.asInstanceOf[String], "src_empty"),
      (2L, null.asInstanceOf[String], "src_empty"))
      .toDF("doc_id", "text", "source")
    val plan = Sampling.tokenBudgetMix(docs, "text", "source",
      budget = 15L, maxEpochs = 2L, weights = Map("src_empty" -> 100L))
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val empty = plan("src_empty")
    assert(empty._2 == 0L && empty._4 == 0L && empty._5 == 0L && empty._7)
    assert(empty._6 == 0.0 && !empty._6.isNaN)
    // its (huge) weight is excluded from round 1 on, so src_real gets all 15
    assert(plan("src_real")._5 == 15L)
  }

  test("token-budget waterfill: no Long overflow at extreme budget x weight") {
    import spark.implicits._
    val docs = Seq((0L, "t t t t", "a"), (1L, "t t t t", "b"))
      .toDF("doc_id", "text", "source")
    // surplus * w would overflow Long (~9e18 * 1e6); the BigInt share must
    // still allocate each source exactly its 8-token capacity.
    val plan = Sampling.tokenBudgetMix(docs, "text", "source",
      budget = Long.MaxValue / 2, maxEpochs = 2L,
      weights = Map("a" -> 1000000L), defaultWeight = 1L)
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
    assert(plan.forall(r => r._5 == 8L && r._7 && r._6 == 2.0),
      s"both sources must cap at 8 tokens, got ${plan.mkString(";")}")
  }
}
