package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup
    (4L, "completely different content with no overlap whatsoever here now")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id survivor with copy count") {
    val got = Dedup.exact(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("minhash: identical docs share full signature; LSH pairs find dups") {
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(sig(0).toSeq.drop(1) == sig(1).toSeq.drop(1)) // doc1 == doc2 signature
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))          // exact dups always collide
    assert(!pairs.exists(p => p._2 == 4L))    // unrelated doc never pairs
  }

  test("simhash: identical docs equal, near-dups close in hamming distance") {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
  }

  test("ngram jaccard: dup pair = 1.0, near-dup in (0,1), ordered output") {
    val j = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.3 && j((1L, 3L)) < 1.0)
    assert(!j.contains((1L, 4L))) // no shared shingles -> no pair row
  }

  test("embedding near-dup finds the planted duplicate") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, "embedding", "vec_id", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard maxDf cap bounds skew and keeps exact values") {
    // Boilerplate skew corpus: every doc shares one hot header shingle
    // ("standard legal disclaimer text"); docs 1/2 are genuine near-dups.
    val boiler = "standard legal disclaimer text"
    val skewed = (1L to 40L).map { i =>
      val body = if (i <= 2) "identical interesting body content here"
      else s"unique body $i with words w${i}a w${i}b w${i}c"
      (i, s"$boiler $body")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(skewed, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val capped = Dedup.ngramJaccardPairs(skewed, "text", "doc_id", maxDf = 10L)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // The hot header pairs every doc with every other doc uncapped...
    assert(uncapped.size == 40 * 39 / 2)
    // ...while the cap keeps only pairs sharing a sub-maxDf shingle — the
    // genuine near-dup — with the EXACT (full-set) jaccard value.
    assert(capped.keySet == Set((1L, 2L)))
    assert(capped((1L, 2L)) == uncapped((1L, 2L)),
      "capped candidate generation must not change reported jaccard values")
  }

  test("dedup groups = connected components of the candidate graph") {
    val real = Tables.documents(spark, sf)
    val pairs = Dedup.minhashCandidatePairs(real, "text", "doc_id")
      .as[(Long, Long)].collect()
    val ids = real.select("doc_id").as[Long].collect()
    // Reference union-find with min-id labels.
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup.dedupGroups(real, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // Closure must be at least as aggressive as the greedy pair-drop.
    assert(expected.count { case (i, l) => i == l } <= ids.length)
  }

  test("simhash banded pair search == all-pairs result, with no product plan") {
    val real = Tables.documents(spark, sf)
    val banded = Dedup.simhashNearDupPairs(real, "text", "doc_id", maxHamming = 12)
    // Reference: the O(N²) cartesian form (fine at spec scale only).
    val sig = Dedup.simhash(real, "text", "doc_id")
    val brute = sig.toDF("doc_a", "sig_a")
      .crossJoin(sig.toDF("doc_b", "sig_b"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= 12)
    val gotPairs = banded.as[(Long, Long, Long)].collect().toSet
    val expPairs = brute.as[(Long, Long, Long)].collect().toSet
    assert(gotPairs == expPairs,
      s"pigeonhole banding must be lossless: missing=${expPairs -- gotPairs} extra=${gotPairs -- expPairs}")
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"banded pair search must not plan a product:\n$plan")
  }

  test("wide simhash (120-bit, 4x30-bit bands) == all-pairs result; exact dups found") {
    val real = Tables.documents(spark, sf)
    val banded = Dedup.simhashNearDupPairsWide(real, "text", "doc_id", maxHamming = 3)
    val sig = Dedup.simhashWide(real, "text", "doc_id")
    val brute = sig.toDF("doc_a", "a0", "a1")
      .crossJoin(sig.toDF("doc_b", "b0", "b1"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(a0 ^ b0) + bit_count(a1 ^ b1) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= 3)
    val gotPairs = banded.as[(Long, Long, Long)].collect().toSet
    val expPairs = brute.as[(Long, Long, Long)].collect().toSet
    assert(gotPairs == expPairs,
      s"4x30-bit pigeonhole banding must be lossless: missing=${expPairs -- gotPairs} extra=${gotPairs -- expPairs}")
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"wide banded pair search must not plan a product:\n$plan")
    // identical docs have identical 120-bit signatures -> hamming 0 pair
    val dup = Dedup.simhashNearDupPairsWide(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(dup.contains((1L, 2L, 0L)), s"exact dup must surface: $dup")
  }

  test("bucketed embedding near-dup: subset of exact, nonzero recall, no product") {
    val emb = Tables.embeddings(spark, sf)
    val bucketed = Dedup.embeddingNearDups(emb, "embedding", "vec_id", 0.25, nPlanes = 4)
    val got = bucketed.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDupsExact(emb, "embedding", "vec_id", 0.25)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact), "bucket candidates must verify cosine exactly")
    assert(got.nonEmpty, "multiprobe recall must be nonzero on this corpus")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"bucketed near-dup must not plan a cartesian product:\n$plan")
  }

  test("fuzzy dedup == in-block naive pairs, no product, blocking caveat holds") {
    val real = Tables.documents(spark, sf)
    val blocked = Dedup.fuzzyDedupPairs(real, "text", "doc_id",
      keyLen = 40, blockLen = 8, maxDist = 8)
    // Reference: the naive same-block levenshtein over an explicit product
    // (spec scale only) — the blocked equi-join must find exactly these.
    val k = real.select(col("doc_id"),
      lower(substring(col("text"), 1, 40)).as("key"))
    val naive = k.toDF("doc_a", "key_a")
      .crossJoin(k.toDF("doc_b", "key_b"))
      .where(col("doc_a") < col("doc_b") &&
        substring(col("key_a"), 1, 8) === substring(col("key_b"), 1, 8) &&
        levenshtein(col("key_a"), col("key_b")) <= 8)
      .select(col("doc_a"), col("doc_b"))
    assert(blocked.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet ==
      naive.as[(Long, Long)].collect().toSet)
    assert(blocked.count() > 0, "corpus has fuzzy matches; zero is a regression")
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"blocked fuzzy dedup must not plan a product:\n$plan")
    // The documented blocking trade-off: one edit INSIDE the block prefix
    // hides a pair; the same edit outside the prefix is found.
    val tiny = Seq(
      (1L, "alpha bravo charlie delta"),
      (2L, "alpha bravo charlie delt"),   // edit past the block prefix: found
      (3L, "Xlpha bravo charlie delta")   // edit in char 1: different block
    ).toDF("doc_id", "text")
    val pairs = Dedup.fuzzyDedupPairs(tiny, "text", "doc_id",
      keyLen = 40, blockLen = 8, maxDist = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "suffix edit must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "prefix edit lands in another block (the documented recall caveat)")
  }

  test("containment finds a contained excerpt that jaccard misses") {
    val source = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (10 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, source), (2L, excerpt),
      (3L, "entirely unrelated words with zero shared shingles at all here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "text", "doc_id",
      minContainment = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.toSeq == Seq((1L, 2L, 9.0 / 58.0, 1.0)),
      s"excerpt must be fully contained: ${cont.toSeq}")
    // The same pair sits far below any useful jaccard threshold.
    val jac = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", minJaccard = 0.5)
    assert(jac.count() == 0, "jaccard must miss the asymmetric pair")
  }

  test("capped containment: bound prune keeps exact values, hot adds back") {
    // Corpus where the TRUE pair's containment depends on hot shingles:
    // every doc opens with a 39-doc boilerplate header (hot at maxDf=10);
    // doc 2 is an excerpt of doc 1 whose COLD overlap alone (18/26 = 0.69)
    // sits BELOW the 0.8 threshold — only the hot add-back lifts it over
    // (24/26 = 0.92). A prune that dropped candidates before adding the
    // hot contribution, or added it wrong, fails this test. Doc 4 is pure
    // boilerplate: contained in everything, but its overlap is 100% hot —
    // the documented df-cap trade-off says capped candidate generation
    // misses it, and ONLY it.
    val boiler = "standard legal disclaimer text goes right here"
    val docs = (Seq(
      1L -> (boiler + " " + (1 to 40).map("tok" + _).mkString(" ")),
      2L -> (boiler + " " + (5 to 24).map("tok" + _).mkString(" ")),
      4L -> boiler) ++
      (10L to 45L).map(i => i -> s"$boiler unique u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val uncapped = collectPairs(
      Dedup.containmentPairs(docs, "text", "doc_id", minContainment = 0.8))
    val capped = collectPairs(Dedup.containmentPairs(
      docs, "text", "doc_id", minContainment = 0.8, maxDf = 10L))
    // uncapped sees the excerpt pair AND doc 4 contained in every doc
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 4L)))
    // capped keeps exactly the pairs with any cold overlap — here (1,2) —
    // with values IDENTICAL to the exact form (hot contribution restored)
    assert(capped.keySet == Set((1L, 2L)),
      s"capped must keep only the cold-overlap pair, got ${capped.keySet}")
    assert(capped((1L, 2L)) == uncapped((1L, 2L)),
      "capped values must equal the exact (uncapped) containment")
    // and that value (excerpt side, c/nb) is only reachable WITH the hot
    // add-back: cold alone reads 18/26 = 0.69
    assert(capped((1L, 2L))._2 > 0.9 && capped((1L, 2L))._2 < 0.95)
  }

  test("capped containment: exact-boundary threshold survives the prune") {
    // The division-form prune contract (round 9): a pair sitting EXACTLY
    // on the threshold must survive. Engineered rounding case c=7,
    // minN=25: fl(fl(7/25) * 25) = 7.000000000000001 > 7, so the old
    // multiplication-form prune (c >= t * minN) dropped this pair even
    // though the final filter fl(c/minN) >= t keeps it. Docs 1/2 share a
    // 9-token run (7 shingles, all cold); 41 skew docs make the corpus
    // carry hot shingles so the capped branch is exercised with
    // ha = hb = 0 (bound exactly tight: c_ub = c).
    val run = (1 to 9).map("r" + _).mkString(" ")
    val a = ((1 to 10).map("a" + _) ++ Seq(run) ++ (11 to 21).map("a" + _))
      .mkString(" ") // 30 tokens -> na = 28
    val b = ((1 to 9).map("b" + _) ++ Seq(run) ++ (10 to 18).map("b" + _))
      .mkString(" ") // 27 tokens -> nb = 25
    val corpus = (Seq(1L -> a, 2L -> b) ++ (100L to 140L).map(i =>
      i -> s"hotA hotB hotC hotD hotE u${i}x u${i}y"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(corpus, "text", "doc_id",
      minContainment = 7.0 / 25.0, maxDf = 10L)
      .where(col("doc_a") === 1L && col("doc_b") === 2L)
      .as[(Long, Long, Double, Double)].collect()
    assert(capped.toSeq == Seq((1L, 2L, 7.0 / 28.0, 7.0 / 25.0)),
      s"exact-boundary pair must survive the prune: ${capped.toSeq}")
  }

  test("capped jaccard: bound prune keeps exact values, hot adds back") {
    // Jaccard twin of the containment prune test (round 9): pair (1,2)'s
    // cold-only jaccard 18/(45+25-18) = 0.346 sits BELOW the 0.45
    // threshold — only the hot add-back lifts the true value
    // 23/(45+25-23) = 0.489 over it, so a prune that ignored the hot
    // upper-bound term would drop the pair. (The closest noise pair, two
    // boilerplate docs, reads 6/14 = 0.43 — still under the threshold.)
    val boiler = "standard legal disclaimer text goes right here"
    val docs = (Seq(
      1L -> (boiler + " " + (1 to 40).map("tok" + _).mkString(" ")),
      2L -> (boiler + " " + (5 to 24).map("tok" + _).mkString(" "))) ++
      (10L to 45L).map(i => i -> s"$boiler unique u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    def collectJac(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val uncapped = collectJac(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", minJaccard = 0.45))
    val capped = collectJac(Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", minJaccard = 0.45, maxDf = 10L))
    assert(capped.keySet == Set((1L, 2L)),
      s"capped must keep only the cold-overlap pair, got ${capped.keySet}")
    assert(capped((1L, 2L)) == uncapped((1L, 2L)),
      "capped values must equal the exact (uncapped) jaccard")
    // only reachable WITH the hot contribution: cold alone reads 0.346
    assert(capped((1L, 2L)) > 0.45 && capped((1L, 2L)) < 0.55)
  }

  test("hard negatives: wrong-label only, correctly ranked, k per anchor") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.hardNegatives(emb, "embedding", "vec_id", "label", 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val labels = emb.select("vec_id", "label")
      .as[(Long, Long)].collect().toMap
    val anchors = labels.groupBy(_._2).map { case (l, m) => l -> m.keys.min }
    // exactly k rows per anchor; no negative shares its anchor's label
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == anchors.values.toSet)
    byAnchor.foreach { case (aid, rows) =>
      assert(rows.size == 5 && rows.map(_._4).sorted == Seq(1L, 2L, 3L, 4L, 5L))
      rows.foreach { case (_, vid, _, _) =>
        assert(labels(vid) != labels(aid), s"negative $vid shares label of $aid")
      }
      // ranked by sim desc
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims == sims.sorted.reverse)
    }
  }

  test("ivf topk is a subset-quality approximation of brute force") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(emb, "embedding", "vec_id", 0L, 10, 8)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size == 10)
    // IVF probes one cluster; recall must be nonzero on this data
    assert((exact & approx).nonEmpty)
  }

  test("incremental near-dedup == batch-vs-corpus slice of the full pair graph") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = docs.where($"source" === "src3")
    val corpus = docs.where($"source" =!= "src3")
    val incr = Dedup.incrementalNearDups(corpus, batch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // reference: full all-docs pair graph, restricted to batch-corpus edges
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val full = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        Seq(a).filter(x => batchIds(x) && !batchIds(b)) ++
          Seq(b).filter(x => batchIds(x) && !batchIds(a))
      }.toSet
    assert(incr == full)
    // and the cleaned batch is exactly the unflagged remainder
    val dropped = Dedup.dropIncrementalNearDups(corpus, batch, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(dropped == batchIds -- incr)
  }

  test("persisted band index probe == recomputed incremental near-dedup") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = docs.where($"source" === "src3")
    val corpus = docs.where($"source" =!= "src3")
    val dir = java.nio.file.Files.createTempDirectory("graft-band-idx").toString
    Dedup.writeBandIndex(corpus, "text", "doc_id", dir)
    // the amortized probe (index scan, batch bands broadcast) must return
    // the exact rows the strict recompute form returns
    val probed = Dedup.probeBandIndex(spark, dir, batch, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    val recomputed = Dedup.incrementalNearDups(corpus, batch, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(probed == recomputed && probed.nonEmpty)
    // plan shape: the batch side is the broadcast build; the index scan is
    // never exchanged before the join
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Dedup.probeBandIndex(spark, dir, batch, "text", "doc_id")
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    assert(plan.find(_.isInstanceOf[BroadcastHashJoinExec]).isDefined,
      s"probe should broadcast the batch bands:\n$plan")
  }

  test("append-delta band index == full rebuild, reusing prior files verbatim") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = docs.where($"source" === "src3")
    val corpus = docs.where($"source" =!= "src3")
    val a = corpus.where(pmod($"doc_id", lit(2)) === 0)
    val b = corpus.where(pmod($"doc_id", lit(2)) === 1)
    val work = java.nio.file.Files.createTempDirectory("graft-band-append")
    // generation 1: full index over half the corpus
    val gen1 = new java.io.File(work.toFile, "gen1").toString
    Dedup.writeBandIndex(a, "text", "doc_id", gen1)
    // the other half arrives as "appended files": stage it as parquet and
    // hand appendBandIndex exactly those data files, as findAppendDelta would
    val bDir = new java.io.File(work.toFile, "b.parquet")
    b.write.parquet(bDir.toString)
    val bFiles = bDir.listFiles().filter(f => !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")).map(_.getAbsolutePath).toSeq
    val gen2 = new java.io.File(work.toFile, "gen2").toString
    Dedup.appendBandIndex(spark,
      operators.IndexStore.AppendDelta(gen1, bFiles), gen2, "text", "doc_id")
    // the append's job commit is the generation's readiness marker
    assert(new java.io.File(gen2, "_SUCCESS").exists(),
      "appendBandIndex must commit _SUCCESS last")
    // generation 1's files ride along untouched (link, not recompute)
    val gen1Data = new java.io.File(gen1).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    val gen2Names = new java.io.File(gen2).listFiles().map(_.getName).toSet
    assert(gen1Data.subsetOf(gen2Names),
      "prior generation data files must be carried into the new generation")
    // probe-after-append == probe of a from-scratch full rebuild
    val full = new java.io.File(work.toFile, "full").toString
    Dedup.writeBandIndex(corpus, "text", "doc_id", full)
    val probeAppend = Dedup.probeBandIndex(spark, gen2, batch, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    val probeFull = Dedup.probeBandIndex(spark, full, batch, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(probeAppend == probeFull && probeAppend.nonEmpty)
  }

  test("dedupGroups auto-promotes to reliable checkpoints and survives cache eviction") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      // with a checkpoint dir configured, the loop's rounds must go through
      // reliable df.checkpoint() — label state lives in FILES, not executor
      // blocks, so losing every cached block (the local-mode twin of an
      // executor loss) must not lose the result
      val groups = Dedup.dedupGroups(docs, "text", "doc_id")
      val expected = groups.as[(Long, Long)].collect().toMap
      assert(expected == Dedup
        .dedupGroups(docs, "text", "doc_id", reliableCheckpoints = Some(false))
        .as[(Long, Long)].collect().toMap)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      assert(groups.as[(Long, Long)].collect().toMap == expected)
      // and the loop really checkpointed to the reliable dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files were written")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }

  test("soft dedup weights: unit mass per group, singletons weigh 1.0") {
    val docs = Tables.documents(spark, sf)
    val w = Dedup.softDedupWeights(docs, "text", "doc_id").collect()
    assert(w.length == docs.count())
    // every member of a group shares the size, and weight * size == 1
    assert(w.forall(r => r.getDouble(3) == 1.0d / r.getLong(2)))
    // total mass == number of groups (each group contributes exactly 1)
    val nGroups = w.map(_.getLong(1)).distinct.length
    val mass = w.map(_.getDouble(3)).sum
    assert(math.abs(mass - nGroups) < 1e-9, s"mass $mass vs $nGroups groups")
    // weights agree with the hard-dedup group structure
    val groups = Dedup.dedupGroups(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.forall(r => groups(r.getLong(0)) == r.getLong(1)))
  }
  test("connectedComponents converges on a monotone-id chain (the round-12 killer)") {
    // A path 1-2-3-...-n of strictly increasing ids is the shape that made
    // neighbor-min contraction remove ONE vertex per round (every vertex's
    // min neighbor is its predecessor) and abort at maxIter on valid input.
    // The alternating large-star/small-star scheme doubles the star radius
    // per round, so n=300 must converge in ceil(log2 300) = 9 rounds —
    // well under the default guard — with every vertex labeled 1.
    val n = 300
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    var rounds = 0
    val labels = Dedup.connectedComponents(chain,
        onRound = (r, _) => rounds = r)
      .as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 1L),
      s"chain must collapse to one component: ${labels.filter(_._2 != 1L).take(5).toSeq}")
    assert(rounds <= 10, s"alternation took $rounds rounds on a $n-chain")
    // the >=30-vertex monotone chain from the round-13 brief, explicitly
    val small = (1 until 31).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(small).as[(Long, Long)].collect()
      .forall(_._2 == 1L))
  }

  test("connectedComponents maxIter boundary: exact-budget converges, one-below throws fresh") {
    // r15 ADVICE fix: the probe runs unconditionally each loop entry, so a
    // graph converging in exactly maxIter rounds succeeds (the old loop
    // exited on iter<maxIter BEFORE the final probe and threw with a stale
    // pre-round count — effective budget was maxIter-1).
    val chain = (1 until 40).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    var rounds = 0
    Dedup.connectedComponents(chain, onRound = (r, _) => rounds = r)
    assert(rounds >= 3, s"need a multi-round graph, got $rounds")
    // exactly the budget: must converge cleanly, not throw
    val labels = Dedup.connectedComponents(chain, maxIter = rounds)
      .as[(Long, Long)].collect()
    assert(labels.forall(_._2 == 1L))
    // one below the budget: must throw the loud guard, with a fresh
    // (non-stale, positive) remaining-vertex count in the message
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = rounds - 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    assert(ex.getMessage.contains(s"within ${rounds - 1}"))
  }

  test("canonicalInput fast path matches the general canonicalization") {
    // r18: canonicalInput=true skips the least/greatest+distinct exchange
    // on a caller assertion; on already-canonical pairs the labels must be
    // identical to the general path's.
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val general = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    val fast = Dedup.connectedComponents(pairs, canonicalInput = true)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(fast == general)
  }

  test("connectedComponents == union-find on random graphs") {
    val rng = new scala.util.Random(14)
    for (trial <- 1 to 3) {
      val nV = 120 + trial * 40
      val nE = nV * 3 / 2
      val raw = Seq.fill(nE)((rng.nextInt(nV).toLong + 1L,
        rng.nextInt(nV).toLong + 1L)).filter(p => p._1 != p._2)
      val parent = scala.collection.mutable.Map(
        (1L to nV.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = raw.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = inGraph.map(i => i -> find(i)).toMap
      val got = Dedup.connectedComponents(raw.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: CC disagrees with union-find")
    }
  }

  test("CheckpointBridge stats canary: per-round leaf stats stay at the measured bound") {
    // Every round's edge frame is a checkpoint leaf whose sizeInBytes is
    // SET by CheckpointBridge.withStats to 48 bytes x the measured edge
    // count. Without that cap, the default checkpoint stats rewrite
    // compounds join-product estimates multiplicatively across rounds
    // (million-digit BigInts by round ~15 — the r12 sf10 driver hang).
    // A 600-vertex monotone chain forces >= 8 alternation rounds; assert
    // every round's leaf estimate stays <= the honest bound.
    val n = 600
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val bound = BigInt(48L) * (2L * (n - 1))
    var rounds = 0
    val labels = Dedup.connectedComponents(chain, onRound = (r, edges) => {
      rounds = r
      val stats = edges.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(stats > 0 && stats <= bound,
        s"round $r leaf sizeInBytes $stats exceeds measured bound $bound")
    }).as[(Long, Long)].collect()
    assert(rounds >= 8, s"canary needs a deep loop, got $rounds rounds")
    assert(labels.forall(_._2 == 1L))
  }
}
