package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ composed index (r17 — xq116/xq117): probe
  * equivalence against the strict inline [[Similarity.ivfPqTopK]], the
  * frozen-quantizer-pair append contract, the duplicate-query guard, and
  * static cell pruning of the codes scan.
  */
class IvfPqIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private val NCells = 8
  private val M = 4
  private val SubDim = 16
  private val K = 16

  private def buildIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-index-spec").toString
    Similarity.writeIvfPqIndex(emb, "embedding", "vec_id", dir,
      nCells = NCells, m = M, subDim = SubDim, k = K, iters = 2)
    dir
  }

  test("probe == strict inline ivfPqTopK, bit for bit") {
    val dir = buildIndex()
    val got = Similarity.probeIvfPqIndex(spark, dir,
      emb.where(col("vec_id").isin(7L, 11L)), "embedding", "vec_id", kNN = 10)
      .orderBy("query_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val ref = Seq(7L, 11L).flatMap { qid =>
      Similarity.ivfPqTopK(emb, "embedding", "vec_id", qid, 10,
        NCells, M, SubDim, K, iters = 2)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }
    }
    assert(got == ref, "probe must equal the strict per-query IVF-PQ exactly")
  }

  test("probe refuses duplicate query ids") {
    val dir = buildIndex()
    val dup = emb.where(col("vec_id") === 7L)
      .unionByName(emb.where(col("vec_id") === 7L))
    val e = intercept[IllegalArgumentException] {
      Similarity.probeIvfPqIndex(spark, dir, dup, "embedding", "vec_id", 5)
    }
    assert(e.getMessage.contains("duplicate query ids"))
  }

  test("append-delta refresh == frozen-pair index of the grown corpus") {
    val staged = java.nio.file.Files.createTempDirectory("ivfpq-app-stage").toString
    emb.where(pmod(col("vec_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(staged)
    val gen1 = java.nio.file.Files.createTempDirectory("ivfpq-app-g1").toString
    Similarity.writeIvfPqIndex(spark.read.parquet(staged),
      "embedding", "vec_id", gen1, nCells = NCells, m = M, subDim = SubDim,
      k = K, iters = 2)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = files(staged).map(_.getAbsolutePath).toSet
    emb.where(pmod(col("vec_id"), lit(2)) === 1)
      .write.mode("append").parquet(staged)
    val newFiles = files(staged).map(_.getAbsolutePath).filterNot(before).toSeq
    assert(newFiles.nonEmpty)
    val gen2 = java.nio.file.Files.createTempDirectory("ivfpq-app-g2").toString
    Similarity.appendIvfPqIndex(spark,
      operators.IndexStore.AppendDelta(gen1, newFiles), gen2,
      "embedding", "vec_id")
    // both quantizers carried verbatim
    for (sub <- Seq("cells", "codebook")) {
      val a = spark.read.parquet(s"$gen1/$sub")
      val b = spark.read.parquet(s"$gen2/$sub")
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty, s"$sub differs")
    }
    // code rows == encoding + assigning the GROWN corpus under the pair
    val cells = spark.read.parquet(s"$gen1/cells")
    val cb = spark.read.parquet(s"$gen1/codebook")
    val grown = spark.read.parquet(staged)
    val refCodes = Similarity.pqEncode(grown, "embedding", "vec_id", cb, M, SubDim)
      .withColumnRenamed("vec_id", "id")
      .join(Similarity.assignToCentroids(grown, "embedding", "vec_id", cells)
        .select(col("vec_id").cast("long").as("id"), col("cluster").as("cell")), "id")
      .select("id", "sub", "code", "cell")
    val gotCodes = spark.read.parquet(s"$gen2/codes")
      .select("id", "sub", "code", "cell")
    assert(gotCodes.exceptAll(refCodes).isEmpty &&
      refCodes.exceptAll(gotCodes).isEmpty,
      "appended codes must equal the frozen-pair re-index")
  }

  test("probe statically prunes the codes scan to the query cells") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = buildIndex()
    val probe = Similarity.probeIvfPqIndex(spark, dir,
      emb.where(col("vec_id") === 7L), "embedding", "vec_id", 5)
    probe.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: allNodes(q.plan)
        case n => Seq(n)
      }
    val scans = allNodes(probe.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(scans.nonEmpty, "expected a codes file scan")
    assert(scans.forall(_.partitionFilters.exists(_.references.exists(_.name == "cell"))),
      s"codes scan must carry a cell partition filter:\n${scans.map(_.toString)}")
  }
}
