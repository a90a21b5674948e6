package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1—2—3, symmetrized
  private def pathEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")

  test("one pagerank iteration matches the hand computation") {
    // N=3, pr0 = 1/3; deg: 1->1, 2->2, 3->1
    // pr1(1) = 0.15/3 + 0.85 * (pr0(2)/2)          = 0.05 + 0.85/6
    // pr1(2) = 0.15/3 + 0.85 * (pr0(1) + pr0(3))   = 0.05 + 0.85*2/3
    // pr1(3) = pr1(1)
    val got = Graphs.pageRank(pathEdges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e1 = 0.05 + 0.85 * (1.0 / 6)
    val e2 = 0.05 + 0.85 * (2.0 / 3)
    assert(math.abs(got(1L) - e1) < 1e-9, s"${got(1L)} vs $e1")
    assert(math.abs(got(2L) - e2) < 1e-9, s"${got(2L)} vs $e2")
    assert(math.abs(got(3L) - e1) < 1e-9)
  }

  test("rank mass is conserved across iterations (no dangling leaks)") {
    val pr = Graphs.pageRank(pathEdges, iters = 5)
    val total = pr.agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"mass $total drifted from 1")
    // center of the path outranks the ends
    val byId = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(2L) > byId(1L) && byId(2L) > byId(3L))
  }

  test("pagerank is deterministic under repartitioning") {
    val edges = pathEdges.unionByName(Seq((3L, 1L), (1L, 3L)).toDF("src", "dst"))
    val a = Graphs.pageRank(edges, iters = 4).orderBy("id").collect().toSeq
    val b = Graphs.pageRank(edges.repartition(7), iters = 4).orderBy("id").collect().toSeq
    assert(a == b, "quantized contributions must make ranks partition-independent")
  }

  test("triangle counts: K4 plus a pendant vertex, hand-checked") {
    // K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles, clustering 1.
    // Node 5 hangs off node 1: degree 1, no triangles, clustering 0.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val got = Graphs.triangleCounts(pairs).orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 3L, 0.5), (2L, 3L, 3L, 1.0),
      (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0), (5L, 1L, 0L, 0.0)))
  }

  test("triangle counts: a path has none; plan stays product-free") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val tc = Graphs.triangleCounts(pairs)
    assert(tc.collect().forall(_.getLong(2) == 0L))
    val plan = tc.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product in plan:\n$plan")
  }
}
