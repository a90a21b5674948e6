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
