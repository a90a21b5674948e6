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
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleOnly: Boolean = false)

object QueryDef {
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
