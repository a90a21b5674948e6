package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for 100 TB-scale skew and co-location — the knobs the
  * prompt-level plans (broadcast, AQE) don't cover.
  */
object ScaleJoins {

  /** Salted equi-join for skewed keys: the big side gets a deterministic
    * salt derived from a high-cardinality column; the small side is
    * replicated saltFactor times. Breaks one hot key's single reducer into
    * saltFactor reducers. Result rows identical to a plain inner join.
    *
    * (AQE's skew-join split handles sort-merge skew automatically; salting
    * is the explicit form for aggregations-after-join and for engines/modes
    * where AQE can't kick in.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltCol: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(saltCol)), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (co-located). Bucketed tables go through the session
    * catalog (saveAsTable) — the parquet files carry bucket spec metadata.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching bucket
    * specs Catalyst plans a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
