package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One oracle-checkable query: a Spark DataFrame program plus (where
  * SQL-expressible) the equivalent DuckDB SQL the driver hash-matches.
  *
  * `oracleOnly` marks queries kept deliberately in a shape that does NOT
  * scale (e.g. rq26's exact per-group percentile buffers whole groups) as
  * the correctness proof for a scale-path twin (rq28's sketch). The bench
  * reports them separately so the headline number reflects the plans a
  * 100 TB run would actually use.
  *
  * `confs` are session confs this query needs at execution time (e.g. the
  * ObjectHashAggregate fallback threshold for bounded-state aggregates).
  * They are applied via [[QueryDef.applyConfs]] immediately before the
  * query is built — every key in [[QueryDef.managedDefaults]] is first
  * reset to its default, so one query's conf can never leak into the next:
  * a global setting of the fallback threshold was measured to OOM the sf5
  * suite (collect-style unbounded aggregate state held hash-resident).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleOnly: Boolean = false,
    confs: Seq[(String, String)] = Nil)

object QueryDef {
  /** Every conf key any query may declare, with its restore-to default
    * (Spark's own defaults). Reset before each query so declared confs are
    * strictly per-query — plans are lazy, so the set must happen at build
    * time and hold through the immediately-following materialization.
    */
  val managedDefaults: Seq[(String, String)] = Seq(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128",
    // Runtime bloom-filter injection thresholds (InjectRuntimeFilter).
    // Spark's defaults gate injection on a >=10 GB application-side scan —
    // sized for a real cluster, where the fact scans of the TPC-H-shaped
    // queries pass it automatically. At bench SFs the scans are far
    // smaller, so the selective-join queries that WANT the bloom declare
    // these per-query: app-side gate lowered to 10 MB (any bench-scale
    // fact scan qualifies), creation-side cap raised to 256 MB (the
    // date/status-filtered orders build sides estimate above the 10 MB
    // default at sf>=1 without CBO stats). The bloom itself stays bounded:
    // numItems/numBits are clamped by Spark's maxNumItems/maxNumBits, so
    // oversized build sides degrade FPP, never correctness or memory.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "10GB",
    // Bloom sizing caps (Spark defaults 4M items / 64M bits = 8 MB). A
    // build side whose distinct-key count exceeds maxNumItems silently
    // degrades the filter's FPP toward 1 — at sf10 rq52's status-F orders
    // build is ~5M keys, so the capped bloom was measured NEUTRAL (r15).
    // Queries that expect build keys beyond 4M declare raised caps; the
    // restore keeps every other query on Spark's defaults.
    "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> "4000000",
    "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> "67108864")

  /** Reset managed keys to defaults, then apply this query's declared confs. */
  def applyConfs(s: SparkSession, confs: Seq[(String, String)]): Unit = {
    managedDefaults.foreach { case (k, v) => s.conf.set(k, v) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** Cross-engine determinism helpers (SURVEY §7 risk (a)):
    * floating aggregation order differs between engines, so every SUM/AVG
    * over a double column routes through exact DECIMAL arithmetic and is cast
    * back to DOUBLE only at the end — the decimal->double conversion is the
    * same IEEE value in Spark and DuckDB, so results hash-match bit-exactly.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact average: decimal sum cast to double, divided by count (both IEEE
    * ops on identical inputs → identical result in both engines).
    */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** Oracle-side twins of dsum/davg. */
  def oSum(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def oAvg(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"
}
