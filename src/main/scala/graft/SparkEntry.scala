package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query in
  * `queries`, with a DuckDB-equivalent SQL in `oracleSql` where the semantics
  * are SQL-expressible (the driver hash-matches the two; queries without an
  * oracle get a rows-only check).
  */
object SparkEntry {

  /** All declared queries, assembled from the per-area registries. */
  val allDefs: Seq[QueryDef] =
    PleiadesQueries.defs ++ RelationalQueries.defs ++ ExtensionQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The counter fan-out + daily aggregation is the reference's core
    * semantics end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pq02_counter_fanout")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each entry
    * applies the query's declared session confs (with managed defaults
    * reset first) before building its frame — see [[QueryDef.applyConfs]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> ((s: SparkSession, d: String) => {
      QueryDef.applyConfs(s, q.confs); q.run(s, d)
    })).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
