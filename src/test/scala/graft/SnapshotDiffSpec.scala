package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added, removed, changed, unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "x"), (4L, "d")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    val sums = SnapshotDiff.summary(v1, v2, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("identical snapshots diff to all-unchanged") {
    val v = Tables.documents(spark, sf).select("doc_id", "text")
    val sums = SnapshotDiff.summary(v, v, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("unchanged" -> v.count()))
  }
}
