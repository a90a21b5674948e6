package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup behavior on constructed embeddings (xq47 pins corpus values).
  * Two well-separated directions; duplicates planted inside one of them.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // ids 1,2 seed the two k-means clusters (x-ish and y-ish directions);
  // 3 ≈ 1 (near-dup), 4 = exact copy of 3, 5 is y-ish but not a dup of 2.
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.05f)),
    (2L, Array(0.0f, 1.0f, 0.05f)),
    (3L, Array(0.99f, 0.02f, 0.05f)),
    (4L, Array(0.99f, 0.02f, 0.05f)),
    (5L, Array(0.1f, 0.9f, -0.6f))).toDF("vec_id", "embedding")

  test("in-cluster near-dups removed, min id survives, distinct members kept") {
    val removed = Similarity.semDedup(vecs, "embedding", "vec_id",
      k = 2, iters = 1, threshold = 0.98d)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cluster of 1: {1,3,4} all pairwise >= 0.98 -> 3 and 4 removed, both
    // trace to survivor 1; cluster of 2: {2,5} below threshold -> kept.
    assert(removed.toSeq == Seq((3L, 1L, 1L), (4L, 1L, 1L)))
  }

  test("survivors are the complement of the removed set") {
    val kept = Similarity.semDedupSurvivors(vecs, "embedding", "vec_id",
      k = 2, iters = 1, threshold = 0.98d)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L))
  }

  test("cross-cluster near-dups are NOT flagged (the approximation semantics)") {
    // 10 sits exactly between the clusters but lands in one of them; its
    // twin 11 lands in the same cluster (same vector, same assignment), so
    // equal vectors are always co-clustered and DO get flagged — the only
    // missed pairs are similar-but-unequal vectors split by the boundary.
    val withTwin = vecs.union(Seq(
      (10L, Array(0.7f, 0.7f, 0.0f)),
      (11L, Array(0.7f, 0.7f, 0.0f))).toDF("vec_id", "embedding"))
    val removed = Similarity.semDedup(withTwin, "embedding", "vec_id",
      k = 2, iters = 1, threshold = 0.98d)
      .select("vec_id").as[Long].collect().toSet
    assert(removed.contains(11L) && !removed.contains(10L))
  }

  test("default k is scale-right (k ∝ N) and matches the explicit form") {
    val emb = Tables.embeddings(spark, sf)
    // the contract: N / 625 vectors per cluster, floored at 8
    val n = emb.count()
    val expectedK = math.max(8, (n / Similarity.SemDedupClusterSize).toInt)
    assert(Similarity.semDedupK(emb) == expectedK)
    // the k=0 default must produce exactly the explicit-k result
    val auto = Similarity.semDedup(emb, "embedding", "vec_id",
      iters = 1, threshold = 0.25d)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val explicit = Similarity.semDedup(emb, "embedding", "vec_id",
      k = expectedK, iters = 1, threshold = 0.25d)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(auto == explicit)
    // and the oracle-pinned configuration stays available unchanged
    val pinned = Similarity.semDedup(emb, "embedding", "vec_id",
      k = 8, iters = 1, threshold = 0.25d)
    assert(pinned.select(max(col("cluster"))).first().getLong(0) < 8L ||
      pinned.isEmpty)
  }

  test("mmrRerank skips the near-duplicate a pure top-k would keep") {
    import spark.implicits._
    // q on the x-axis; a at +30deg azimuth, b 2deg beside a (near-dup,
    // sim(a,b)=0.9994), c at 34deg on the OPPOSITE azimuth
    // (sim(a,c)=0.438). Pure cosine ranking: a (0.8660), b (0.8480),
    // c (0.8291). MMR(0.7/0.3) after a: mmr(b)=0.294 < mmr(c)=0.449 --
    // b's redundancy beats its relevance edge, so the order is a, c, b.
    val vecs = Seq(
      (42L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.866, 0.5, 0.0)),
      (2L, Seq(0.848, 0.530, 0.0)),
      (3L, Seq(0.829, -0.559, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(vecs, "embedding", "vec_id",
      queryId = 42L, window = 3, m = 3)
      .orderBy("rk").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L),
      s"expected MMR order a, c, b; got $got")
  }

  test("mmrRerank first pick is the cosine argmax; ranks are 1..m") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.mmrRerank(emb, "embedding", "vec_id",
      queryId = 42L, window = 20, m = 5).orderBy("rk").collect()
    assert(got.map(_.getLong(0)).toSeq == (1L to 5L))
    val top1 = Similarity.bruteForceTopK(
      emb, "embedding", "vec_id", queryId = 42L, k = 1)
      .collect().head.getLong(0)
    assert(got.head.getLong(1) == top1,
      "MMR's first pick must equal the plain cosine argmax")
  }
}
