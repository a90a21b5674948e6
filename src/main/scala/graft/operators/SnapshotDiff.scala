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

  /** Apply a change feed to a snapshot — the MERGE/upsert that turns
    * [[diff]]'s output back into the next corpus version: rows in
    * `upserts` replace same-id base rows (or insert when new), ids in
    * `deletes` drop out. Two anti-joins + one union, all keyed by id —
    * O(base + delta) with the usual co-partitioned exchange; no
    * whole-corpus rewrite logic hides in here (at rest, pair with the
    * day/partition-scoped dynamic overwrite the CounterPipeline merge
    * uses, so only touched partitions rewrite).
    */
  def applyChanges(base: DataFrame, upserts: DataFrame, deletes: DataFrame,
      idCol: String): DataFrame =
    base
      .join(deletes.select(col(idCol)), Seq(idCol), "left_anti")
      .join(upserts.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(upserts.join(deletes.select(col(idCol)), Seq(idCol), "left_anti"))

  /** Order-free table digest — one 60-bit fingerprint + row count per
    * group: XOR of per-row md5 hashes over (id, content). XOR is
    * commutative/associative and never overflows, so the digest is
    * independent of row order, partitioning, and engine — equal digests +
    * equal counts mean replicas/snapshots agree without shipping either
    * side (the anti-entropy check that fronts [[diff]]; run diff only when
    * digests disagree). Caveat inherent to XOR: a row appearing an EVEN
    * number of times cancels out — ids make rows unique here, and the count
    * catches pure duplications.
    */
  def tableDigest(df: DataFrame, idCol: String, contentCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val rowHash = expr(
      s"graft_md5p60(concat(CAST($idCol AS STRING), '|', " +
        s"CAST($contentCol AS STRING)))")
    val withHash = df.withColumn("_rh", rowHash)
    val aggs = Seq(expr("bit_xor(_rh)").as("digest"),
      count(lit(1)).as("n_rows"))
    if (groupCols.isEmpty) withHash.agg(aggs.head, aggs.tail: _*)
    else withHash.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
