package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.Cacheable

/** Iterative graph algorithms as DataFrame programs — the second family
  * (with [[Dedup.dedupGroups]]' connected components) where "loop over a
  * shuffle" replaces a specialized graph engine.
  *
  * PageRank here serves corpus curation: over a document/embedding
  * similarity graph, rank = how centrally a document sits in its near-dup
  * neighborhood (the canonical pick-the-canonical-copy signal; also the
  * centrality feature web-scale quality filters use on link graphs).
  */
object Graphs {

  /** PageRank over a directed edge list (src, dst) — pass both directions
    * for an undirected graph. Per iteration: one join of edges to current
    * ranks + out-degrees (both keyed by src — a single co-partitioned
    * shuffle at scale), one groupBy(dst) to sum contributions. State is one
    * rank row per node; iterations are a fixed count (the curation use
    * ranks neighborhoods, where 3-5 iterations separate centers from rims).
    *
    * Every node must have out-degree ≥ 1 (true for symmetrized undirected
    * graphs — the intended input; checked). Cross-engine determinism: the
    * per-edge contribution pr/deg is 1e-12-quantized BEFORE the per-node
    * sum, so accumulation is an order-free integer sum and the rank vector
    * is bit-identical across engines/partitionings (xq60's oracle unrolls
    * the iterations as CTEs).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    // teleport is a separate parameter (not computed as 1 - damping): the
    // double 1.0-0.85 is NOT the double 0.15, and the oracle writes the
    // literal — computing it here would shift every rank by 2e-17 and break
    // the bit-exact contract.
    require(iters >= 1, s"need iters >= 1, got $iters")
    val spark = edges.sparkSession
    // Persisted: every iteration re-joins the edge list, and the caller's
    // edge derivation is often itself a join pipeline (xq60's is the LSH
    // pair search) — without the persist each iteration would recompute it
    // from the scan up. Pre-shuffling by src means the per-iteration join
    // reuses one partitioning instead of re-exchanging the edges each round.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .trackedCache
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .trackedCache
    val nodes = e.select(col("src").as("id")).distinct()
    // One count job: n_nodes is constant across iterations (symmetrized
    // graphs give every listed node an in-edge, so no rank row ever
    // disappears), so it rides the loop as a LITERAL instead of the
    // r17 crossJoin(broadcast(count agg)) column — same doubles, one plan
    // node instead of a per-iteration broadcast subtree. The count also
    // sizes the per-round checkpoint stats below.
    val nNodes = nodes.count()
    val nNodesD = lit(nNodes.toDouble)
    // Per-round PLAN cut (r18, guide §2.4/§7.3): the un-cut loop
    // re-optimizes a plan that GROWS by a join+aggregate subtree per
    // iteration — xq60's final frame carried 178 Exchange nodes over 1365
    // plan lines for 3 iterations. Each round's rank frame has exactly ONE
    // consumer (the next round), so the cut is CheckpointBridge.planCut —
    // the compiled RDD wrapped in a fresh leaf with honest row-count
    // stats: planning is O(1) per round, the whole loop still executes as
    // one job chain when the caller materializes, and NO per-round
    // checkpoint jobs or blocks are paid (an eager localCheckpoint variant
    // measured 1.6 -> 3.2 s on xq60 at sf0.1 — four extra job floors).
    def cut(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .planCut(df, BigInt(nNodes.max(1L)) * 16L)
    var pr = nodes.select(col("id"), (lit(1.0) / nNodesD).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          floor((col("pr") / col("deg").cast("double")) * lit(1e12) + lit(0.5))
            .cast("long").as("cq"))
      pr = cut(contrib.groupBy("id")
        .agg(sum(col("cq")).as("s"))
        .select(col("id"),
          (lit(teleport) / nNodesD +
            lit(damping) * (col("s").cast("double") / lit(1e12))).as("pr")))
    }
    pr.select("id", "pr")
  }

  /** Per-node triangle counts, degree and local clustering coefficient over
    * an undirected graph given as DISTINCT canonical pairs (a < b) — on a
    * similarity graph, high clustering marks tight near-dup communities
    * (dense boilerplate families) vs incidental chains.
    *
    * Oriented-join scheme: every triangle {a<b<c} is enumerated exactly
    * once as (a,b)⋈(b,c) wedges semi-joined against the closing edge (a,c)
    * — two equi-join exchanges keyed on node ids, no product, no
    * symmetrized blow-up. Skew = high-degree hubs (the classic wedge bound
    * Σ deg²); at corpus scale the standard mitigation is degree-ordering
    * the orientation, which canonical a<b pairs approximate for free.
    *
    * clustering = 2·triangles / (deg·(deg−1)) — a ratio of exact integers,
    * bit-identical cross-engine.
    */
  def triangleCounts(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .trackedCache
    val wedges = p.as("e1").join(p.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tri = wedges.join(p.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val deg = p.select(col("a").as("id"))
      .unionAll(p.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          (col("triangles") * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .otherwise(lit(0.0d)))
  }
}
