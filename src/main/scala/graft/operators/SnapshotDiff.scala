package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the change feed between two versions of a
  * continuously-recrawled corpus: which documents were added, removed, or
  * changed since the last snapshot. Downstream consumers (index updates,
  * incremental dedup via [[Dedup.incrementalNearDups]], training-set
  * refresh) then process O(delta) instead of O(corpus).
  *
  * One full-outer join keyed by id (a single co-partitioned exchange;
  * content compared by md5 so the exchange carries 32-byte digests, not
  * documents). Status is a pure function of presence + digest equality —
  * deterministic, oracle-checkable (xq62).
  */
object SnapshotDiff {

  /** Row-level diff: (id, status ∈ added|removed|changed|unchanged). */
  def diff(prev: DataFrame, next: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val a = prev.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("_ha"))
    val b = next.select(col(idCol).as("id"),
      md5(col(contentCol).cast("string")).as("_hb"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_ha").isNull, lit("added"))
          .when(col("_hb").isNull, lit("removed"))
          .when(col("_ha") =!= col("_hb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The change summary a recrawl report leads with. */
  def summary(prev: DataFrame, next: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    diff(prev, next, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
