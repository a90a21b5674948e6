package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

/** Sweeping scale-shape audit over EVERY declared query's physical plan:
  * the properties that distinguish "runs at sf0.1" from "runs at 100 TB".
  *
  *  1. No CartesianProductExec anywhere — an O(N·M) product over two
  *     SF-scaling inputs can never ship. (Broadcast nested-loop joins
  *     against fixed-cardinality dims — centroids, planes, a single query
  *     vector — are fine and are NOT flagged.)
  *  2. No partition-less WindowExec over raw (non-aggregated) input — a
  *     global window funnels the whole dataset through one task. Global
  *     windows above an aggregation are metadata-scale and allowed (e.g.
  *     the per-partition-totals prefix sum in packSequences).
  *
  * Planning only — no execution; runs over the smoke SF data.
  */
class PlanShapeSpec extends SparkSpec {

  private def physical(plan: SparkPlan): SparkPlan = plan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def offenders(plan: SparkPlan): Seq[String] = {
    val products = plan.collect {
      case c: CartesianProductExec => s"CartesianProduct: ${c.simpleStringWithNodeId()}"
    }
    val globalWindows = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          w.find(_.isInstanceOf[BaseAggregateExec]).isEmpty =>
        s"single-partition window over raw input: ${w.simpleStringWithNodeId()}"
    }
    products ++ globalWindows
  }

  test("no query plans a cartesian product or a global window over raw data") {
    val bad = SparkEntry.allDefs.flatMap { q =>
      val plan = physical(q.run(spark, sf).queryExecution.executedPlan)
      offenders(plan).map(o => s"${q.name}: $o")
    }
    assert(bad.isEmpty, s"scale-shape offenders:\n${bad.mkString("\n")}")
  }

  test("xq23 top-terms plans map-only: no shuffle before the output sort") {
    // The native TopTerms expression makes per-document top-k a row-local
    // computation; the only exchange the plan may contain is the final
    // presentation ORDER BY's range partitioning. A second exchange means
    // someone reintroduced the (doc_id, term) shuffle + window.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val q = SparkEntry.allDefs.find(_.name == "xq23_top_terms").get
    val plan = physical(q.run(spark, sf).queryExecution.executedPlan)
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size <= 1,
      s"xq23 should shuffle only for the output sort, found ${shuffles.size}:\n$plan")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, "xq23 should not plan a window")
  }

  test("Similarity.assign plans map-only: no exchange, BestCentroid codegen'd") {
    // The ANN assign path (xq14/xq47/xq96) is ONE narrow codegen'd
    // projection — the native BestCentroid expression. Two prior shapes
    // regressed here and must stay dead: the crossJoin + groupBy argmax
    // (full-width exchange of the corpus) and the composed
    // array_max-over-structs form, whose argmax tree a downstream join's
    // isnotnull(cluster) constraint duplicated into a Filter, knocking the
    // stage out of whole-stage codegen (2.8 -> 40 s at sf5, r15).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.functions._
    // collect() stops at QueryStageExec leaves — flatten across AQE stage
    // boundaries so codegen spans inside finalized stages are visible
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }
    def argmaxCodegenned(p: SparkPlan): Boolean =
      allNodes(p).collect { case w: WholeStageCodegenExec => w }
        .exists(_.find(n => n.expressions.exists(
          _.find(_.isInstanceOf[expressions.BestCentroid]).isDefined)).isDefined)
    val emb = Tables.embeddings(spark, sf)
    val assigned = operators.Similarity.assign(emb, "embedding", "vec_id", 4)
    val plan = physical(assigned.queryExecution.executedPlan)
    assert(allNodes(plan).collect { case s: ShuffleExchangeLike => s }.isEmpty,
      s"assign must be map-only, found an exchange:\n$plan")
    assert(argmaxCodegenned(plan),
      s"BestCentroid must sit inside a WholeStageCodegen span:\n$plan")
    // the r15 regression shape: a join whose constraint propagation copies
    // the cluster column into a Filter — the native node keeps the plan
    // codegen'd and the argmax un-duplicated
    val qRow = assigned.where(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"), col("cluster"))
    val j = assigned.where(col("vec_id") =!= 0L).join(broadcast(qRow), "cluster")
      .select(col("vec_id"),
        functions.VectorFunctions.cosine(col("embedding"), col("q_vec")).as("sim"))
    // the join plan is adaptive (broadcast exchange): codegen stages only
    // collapse once THIS queryExecution runs (df.write would spawn a fresh
    // one and leave this plan un-finalized), so collect the smoke-SF frame
    j.collect()
    val jPlan = physical(j.queryExecution.executedPlan)
    assert(argmaxCodegenned(jPlan),
      s"assign under a join must keep the argmax codegen'd:\n$jPlan")
  }

  test("pqEncode plans map-only: no join, no exchange, BestCentroidL2 codegen'd") {
    // The PQ encode path (xq57/xq103/xq108) is generate + ONE narrow
    // codegen'd argmin projection — the native BestCentroidL2 expression
    // (r17). The prior shape must stay dead: explode → broadcast-join
    // codebook → groupBy(id, sub).min_by, a k× row blowup plus a hash
    // aggregate keyed by the subvector (xq57's 3.0×/3.7× sf5/sf10
    // residual, r16 VERDICT #1).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }
    val emb = Tables.embeddings(spark, sf)
    val cb = operators.Similarity.pqTrain(emb, "embedding", "vec_id",
      m = 4, subDim = 16, k = 16, iters = 1)
    val codes = operators.Similarity.pqEncode(emb, "embedding", "vec_id",
      cb, m = 4, subDim = 16)
    val plan = physical(codes.queryExecution.executedPlan)
    assert(allNodes(plan).collect { case s: ShuffleExchangeLike => s }.isEmpty,
      s"pqEncode must be map-only, found an exchange:\n$plan")
    assert(allNodes(plan).collect { case j: BaseJoinExec => j }.isEmpty,
      s"pqEncode must not join the codebook, found a join:\n$plan")
    assert(allNodes(plan).collect { case w: WholeStageCodegenExec => w }
      .exists(_.find(n => n.expressions.exists(
        _.find(_.isInstanceOf[expressions.BestCentroidL2]).isDefined)).isDefined),
      s"BestCentroidL2 must sit inside a WholeStageCodegen span:\n$plan")
  }

  test("pq16's tail is a single partition (sortWithinPartitions totality)") {
    // pq16 replaces its output orderBy with sortWithinPartitions("stage"),
    // which is a TOTAL order only because the ungrouped global aggregate
    // collapses to one partition — an implicit physical invariant (r16
    // ADVICE): if a plan change ever re-partitions the tail, this fails
    // HERE by name instead of as a verify-time hash mismatch. Also pins
    // the reason the orderBy was dropped: no range exchange (the
    // range-partitioner sampling job cost one dispatch floor per SF).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val q = SparkEntry.allDefs.find(_.name == "pq16_funnel").get
    val df = q.run(spark, sf)
    assert(df.rdd.getNumPartitions == 1,
      "pq16's post-aggregate tail must be exactly one partition")
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }.flatMap {
      case qs: QueryStageExec => qs +: allNodes(qs.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }
    val ranged = allNodes(physical(df.queryExecution.executedPlan))
      .collect { case s: ShuffleExchangeLike => s }
      .filter(_.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])
    assert(ranged.isEmpty, s"pq16 must not plan a range exchange:\n$ranged")
  }

  test("per-query confs apply at build time and never leak to the next query") {
    // xq44 declares the raised ObjectHashAggregate fallback threshold
    // (bounded-state TopKRows); any query without the declaration must see
    // the managed default again — a leaked global raise was measured to
    // OOM the sf5 suite on unbounded collect-state aggregates.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    SparkEntry.queries("xq44_bm25")(spark, sf)
    assert(spark.conf.get(key) == "10000000")
    SparkEntry.queries("xq01_exact_dedup")(spark, sf)
    assert(spark.conf.get(key) == "128")
  }
}
