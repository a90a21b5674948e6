package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private val M = 4
  private val SubDim = 16
  private val K = 16

  test("codebook has one entry set per subspace with subDim-wide centroids") {
    val cb = Similarity.pqTrain(emb, "embedding", "vec_id", M, SubDim, K, iters = 2)
    val bySub = cb.groupBy("sub").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySub.keySet == (0 until M).toSet)
    // Lloyd's may drop empty clusters but most of k must survive
    assert(bySub.values.forall(n => n > K / 2 && n <= K), s"cluster counts $bySub")
    val widths = cb.select(size(col("cvec"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(widths == Seq(SubDim))
  }

  test("grouped trainer equals independent per-subspace trainers bit-for-bit") {
    // The round-6 driver-resident rewrite's contract: training all m
    // subspaces in one (sub)-keyed chain changes the JOB structure only —
    // each group's centroids must equal running the single-group L2 trainer
    // on that subspace alone, to the last bit.
    val subs = emb.select(col("vec_id").as("_id"),
      posexplode(array((0 until M).map(s =>
        slice(col("embedding").cast("array<double>"), s * SubDim + 1, SubDim)): _*))
        .as(Seq("sub", "_v")))
    val grouped = Similarity.kmeansFitL2Grouped(subs, K, iters = 2)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2))).toMap
    (0 until M).foreach { s =>
      val solo = Similarity.kmeansFitL2(
        subs.where(col("sub") === s).drop("sub"), K, iters = 2)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      assert(solo.keySet == grouped.keys.filter(_._1 == s).map(_._2).toSet,
        s"sub $s cluster sets differ")
      solo.foreach { case (c, cvec) =>
        assert(grouped((s, c)) == cvec, s"sub $s cluster $c centroid differs")
      }
    }
  }

  test("every vector gets exactly m codes drawn from the codebook") {
    val cb = Similarity.pqTrain(emb, "embedding", "vec_id", M, SubDim, K, iters = 2)
    val codes = Similarity.pqEncode(emb, "embedding", "vec_id", cb, M, SubDim)
    assert(codes.groupBy("vec_id").count().where(col("count") =!= M).count() == 0)
    val orphan = codes.join(cb.select(col("sub"), col("cluster").as("code")),
      Seq("sub", "code"), "left_anti")
    assert(orphan.count() == 0, "every code must reference a codebook entry")
  }

  test("ADC ranking tracks true geometry (and recall is measured honestly)") {
    // This corpus is i.i.d. gaussian — the regime where high-dim distances
    // concentrate and exact top-10 recall of ANY coded method collapses
    // (same finding as the sign-LSH recall measurement in COVERAGE.md). The
    // robust property quantization MUST keep is coarse ordering: candidates
    // ADC ranks close should be genuinely closer than average.
    val q = emb.where(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>").as("q"))
    val exactD2 = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .where(col("vec_id") =!= 7L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), expr(
        "aggregate(zip_with(v, q, (x,y) -> (x-y)*(x-y)), CAST(0.0 AS DOUBLE), (a,x) -> a + x)")
        .as("d2"))
    val n = exactD2.count()
    val adcTop = Similarity.pqTopK(emb, "embedding", "vec_id",
      queryId = 7L, kNN = 50, M, SubDim, K, iters = 2).select("vec_id")
    val meanTop = exactD2.join(adcTop, "vec_id")
      .agg(avg("d2")).collect()(0).getDouble(0)
    val meanAll = exactD2.agg(avg("d2")).collect()(0).getDouble(0)
    info(f"mean exact d2: ADC-top-50 $meanTop%.2f vs corpus $meanAll%.2f (n=$n)")
    assert(meanTop < meanAll,
      s"ADC's preferred candidates must be closer than average: $meanTop vs $meanAll")

    val pq10 = Similarity.pqTopK(emb, "embedding", "vec_id",
      queryId = 7L, kNN = 10, M, SubDim, K, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact10 = exactD2.orderBy(col("d2").asc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    info(s"PQ recall@10 = ${(pq10 & exact10).size}/10 (m=$M k=$K, gaussian corpus)")
  }

  test("IVF-PQ probes only the query's cell and keeps PQ's ADC distances") {
    val nCells = 8
    val res = Similarity.ivfPqTopK(emb, "embedding", "vec_id",
      queryId = 7L, kNN = 10, nCells, M, SubDim, K, iters = 2)
    val cells = Similarity.assign(emb, "embedding", "vec_id", nCells)
      .select(col("vec_id"), col("cluster").as("cell"))
    val qCell = cells.where(col("vec_id") === 7L)
      .select("cell").collect()(0).getLong(0)
    val outside = res.join(cells, "vec_id").where(col("cell") =!= qCell)
    assert(outside.count() == 0, "IVF-PQ must only return the probed cell")
    // ADC distances agree with the pure-PQ path for the same candidates
    val pq = Similarity.pqTopK(emb, "embedding", "vec_id", 7L, 1000, M, SubDim, K, 2)
      .withColumnRenamed("adc_dist2", "pq_d2")
    val mismatch = res.join(pq, "vec_id")
      .where(col("adc_dist2") =!= col("pq_d2"))
    assert(mismatch.count() == 0, "cell pruning must not change ADC distances")
  }

  test("persisted PQ index probe == strict pqTopK, bit for bit") {
    // The amortized-regime contract (round 9, xq103): scoring a query
    // batch against the PERSISTED codebook+codes must reproduce the strict
    // retrain-per-query path exactly — same LUT doubles (parquet
    // round-trips IEEE doubles losslessly), same quantized integer sums,
    // same tie-broken ranking.
    val dir = java.nio.file.Files.createTempDirectory("pq-index-spec").toString
    Similarity.writePqIndex(emb, "embedding", "vec_id", dir, M, SubDim, K, 2)
    val probe = Similarity.probePqIndex(spark, dir,
      emb.where(col("vec_id").isin(7L, 11L)), "embedding", "vec_id", kNN = 10)
      .orderBy("query_id", "rk").collect().toSeq
    val strict = Seq(7L, 11L).flatMap { qid =>
      Similarity.pqTopK(emb, "embedding", "vec_id", qid, 10, M, SubDim, K, 2)
        .collect().toSeq.zipWithIndex.map { case (r, i) =>
          (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1))
        }
    }
    assert(probe.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))) == strict,
      "probe must equal the strict per-query top-k exactly")
  }

  test("probe refuses duplicate query ids (silent double-count guard)") {
    val dir = java.nio.file.Files.createTempDirectory("pq-dup-spec").toString
    Similarity.writePqIndex(emb, "embedding", "vec_id", dir, M, SubDim, K, 2)
    val dup = emb.where(col("vec_id") === 7L)
      .unionByName(emb.where(col("vec_id") === 7L))
    val e = intercept[IllegalArgumentException] {
      Similarity.probePqIndex(spark, dir, dup, "embedding", "vec_id", 5)
    }
    assert(e.getMessage.contains("duplicate query ids"))
  }

  test("PQ pipeline is deterministic under repartitioning") {
    val a = Similarity.pqTopK(emb, "embedding", "vec_id", 7L, 10, M, SubDim, K, 2)
      .collect().toSeq
    val b = Similarity.pqTopK(emb.repartition(17), "embedding", "vec_id", 7L, 10, M, SubDim, K, 2)
      .collect().toSeq
    assert(a == b, "codes and ADC distances must not depend on partitioning")
  }

  test("append-delta refresh == frozen-codebook encode of the grown corpus") {
    import org.apache.spark.sql.functions.pmod
    val staged = java.nio.file.Files.createTempDirectory("pq-app-stage").toString
    emb.where(pmod(col("vec_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(staged)
    val gen1 = java.nio.file.Files.createTempDirectory("pq-app-g1").toString
    Similarity.writePqIndex(spark.read.parquet(staged),
      "embedding", "vec_id", gen1, M, SubDim, K, 2)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = files(staged).map(_.getAbsolutePath).toSet
    emb.where(pmod(col("vec_id"), lit(2)) === 1)
      .write.mode("append").parquet(staged)
    val newFiles = files(staged).map(_.getAbsolutePath).filterNot(before).toSeq
    assert(newFiles.nonEmpty)
    val gen2 = java.nio.file.Files.createTempDirectory("pq-app-g2").toString
    Similarity.appendPqIndex(spark,
      operators.IndexStore.AppendDelta(gen1, newFiles), gen2,
      "embedding", "vec_id")
    // reference: the SAME frozen codebook encoding the grown corpus
    val cb = spark.read.parquet(s"$gen1/codebook")
    val refCodes = Similarity.pqEncode(spark.read.parquet(staged),
      "embedding", "vec_id", cb, M, SubDim)
      .withColumnRenamed("vec_id", "id")
    val gotCodes = spark.read.parquet(s"$gen2/codes")
    assert(gotCodes.exceptAll(refCodes).isEmpty &&
      refCodes.exceptAll(gotCodes).isEmpty, "codes differ from frozen encode")
    // codebook carried verbatim
    val cb2 = spark.read.parquet(s"$gen2/codebook")
    assert(cb2.exceptAll(cb).isEmpty && cb.exceptAll(cb2).isEmpty)
    // probe over the appended generation answers for rows of BOTH halves
    val probe = Similarity.probePqIndex(spark, gen2,
      emb.where(col("vec_id").isin(7L, 8L)), "embedding", "vec_id", 5)
      .collect()
    assert(probe.length == 10, "both query vectors must get a full top-5")
  }
}
