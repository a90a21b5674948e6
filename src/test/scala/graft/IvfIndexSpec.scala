package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The persisted IVF index family (r17 — xq112/xq113): build-once layout,
  * probe equivalence against an inline reference over the same centroids,
  * the duplicate-query guard, the frozen-quantizer append contract, and
  * static cell pruning of the probe's vectors scan.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  private def buildIndex(iters: Int = 2): String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index-spec").toString
    Similarity.writeIvfIndex(emb, "embedding", "vec_id", dir,
      nCentroids = 8, iters = iters)
    dir
  }

  test("probe == inline assign + in-cell cosine over the same centroids") {
    val dir = buildIndex()
    val cents = spark.read.parquet(dir + "/centroids")
    val got = Similarity.probeIvfIndex(spark, dir,
      emb.where(col("vec_id").isin(7L, 11L)), "embedding", "vec_id", kNN = 10)
      .orderBy("query_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // reference: assign the whole corpus to the stored centroids, scan the
    // query's cell, cosine spelled dot/(sqrt(aa)*sqrt(bb)) like the probe
    val asn = Similarity.assignToCentroids(emb, "embedding", "vec_id", cents)
      .select(col("vec_id"), col("cluster"))
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .join(asn, "vec_id")
    val ref = Seq(7L, 11L).flatMap { qid =>
      val q = e.where(col("vec_id") === qid)
        .select(col("cluster"), col("v").as("qv"))
      e.where(col("vec_id") =!= qid)
        .join(broadcast(q), "cluster")
        .select(col("vec_id"),
          (VectorFunctions.dot(col("v"), col("qv")) /
            (sqrt(VectorFunctions.dot(col("v"), col("v"))) *
              sqrt(VectorFunctions.dot(col("qv"), col("qv"))))).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }
    }
    assert(got == ref, "probe must equal the inline per-query cell scan exactly")
  }

  test("probe refuses duplicate query ids") {
    val dir = buildIndex(iters = 1)
    val dup = emb.where(col("vec_id") === 7L)
      .unionByName(emb.where(col("vec_id") === 7L))
    val e = intercept[IllegalArgumentException] {
      Similarity.probeIvfIndex(spark, dir, dup, "embedding", "vec_id", 5)
    }
    assert(e.getMessage.contains("duplicate query ids"))
  }

  test("append-delta refresh == frozen-centroid index of the grown corpus") {
    val staged = java.nio.file.Files.createTempDirectory("ivf-app-stage").toString
    emb.where(pmod(col("vec_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(staged)
    val gen1 = java.nio.file.Files.createTempDirectory("ivf-app-g1").toString
    Similarity.writeIvfIndex(spark.read.parquet(staged),
      "embedding", "vec_id", gen1, nCentroids = 8, iters = 2)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val before = files(staged).map(_.getAbsolutePath).toSet
    emb.where(pmod(col("vec_id"), lit(2)) === 1)
      .write.mode("append").parquet(staged)
    val newFiles = files(staged).map(_.getAbsolutePath).filterNot(before).toSeq
    assert(newFiles.nonEmpty)
    val gen2 = java.nio.file.Files.createTempDirectory("ivf-app-g2").toString
    Similarity.appendIvfIndex(spark,
      operators.IndexStore.AppendDelta(gen1, newFiles), gen2,
      "embedding", "vec_id")
    // centroids carried verbatim (frozen quantizer)
    val c1 = spark.read.parquet(s"$gen1/centroids")
    val c2 = spark.read.parquet(s"$gen2/centroids")
    assert(c2.exceptAll(c1).isEmpty && c1.exceptAll(c2).isEmpty)
    // vector rows == assigning the GROWN corpus under the frozen centroids
    val ref = Similarity.assignToCentroids(spark.read.parquet(staged),
        "embedding", "vec_id", c1)
      .select(col("vec_id").as("id"), col("cluster"))
      .join(spark.read.parquet(staged)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("v")), "id")
      .withColumn("norm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
      .select("id", "v", "norm", "cluster")
    val got = spark.read.parquet(s"$gen2/vectors").select("id", "v", "norm", "cluster")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "appended vector store must equal the frozen-centroid re-index")
    // probe over the appended generation answers for rows of BOTH halves
    val probe = Similarity.probeIvfIndex(spark, gen2,
      emb.where(col("vec_id").isin(7L, 8L)), "embedding", "vec_id", 5)
      .collect()
    assert(probe.length == 10, "both query vectors must get a full top-5")
  }

  test("probe statically prunes the vectors scan to the query cells") {
    // the 100 TB posture: cluster id is a PARTITION column of the stored
    // corpus; a probe reads only its query cells' files, never the corpus
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = buildIndex(iters = 1)
    val probe = Similarity.probeIvfIndex(spark, dir,
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
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("vectors")))
    assert(scans.nonEmpty, "expected a vectors file scan")
    assert(scans.forall(_.partitionFilters.exists(_.references.exists(_.name == "cluster"))),
      s"vectors scan must carry a cluster partition filter:\n${scans.map(_.toString)}")
    // and the pruned scan covers strictly fewer cells than the index holds
    val nCells = spark.read.parquet(dir + "/vectors")
      .select("cluster").distinct().count()
    assert(nCells > 1, "fixture must produce multiple cells")
  }
}
