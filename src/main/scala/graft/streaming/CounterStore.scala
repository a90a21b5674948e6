package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The interactive query surface over the counter aggregate store — the
  * reference's REST + dashboard queries (SURVEY §2.2 T9-T22) as a DataFrame
  * library. Reads prune on the `day` partition column exactly like the
  * reference's `day_<d>_*` key-prefix scans (`web/handler.go:126-135`).
  */
class CounterStore(spark: SparkSession, tableDir: String) {

  /** Resolved per call: each query reads the generation that is live at
    * ITS moment ([[CounterTable]]), isolated from concurrent merges.
    */
  def table: DataFrame = CounterTable.read(spark, tableDir)

  /** T9/T13: all counters of one day (partition-pruned point query). */
  def countersForDay(day: Long): DataFrame =
    table.where(col("day") === day)
      .select(col("counter").as("name"), col("n").as("value"))
      .orderBy("name")

  /** T13: counters of "today" (processing-time now / 86400, handler.go:61-63). */
  def currentDayCounters(): DataFrame =
    countersForDay(System.currentTimeMillis() / 86400000L)

  /** T12/T21/T22: distinct days above the quality floor (the reference's
    * hard-coded `day > 18488`, handler.go:190), most recent first, with the
    * ISO date string and the `Since` epoch-seconds the API returns.
    */
  def availableDays(minDay: Long = 18488L): DataFrame =
    table.select("day").where(col("day") > minDay).distinct()
      .select(col("day"),
        date_format(timestamp_seconds(col("day") * 86400), "yyyy-MM-dd").as("date"),
        (col("day") * 86400).as("since"))
      .orderBy(col("day").desc)

  /** T14+T15: prefix/suffix-filtered top-k (store.js:20-27 — top 14 wikis
    * ending in "wiki", excluding wikidata).
    */
  def topKByPrefix(day: Long, prefix: String, suffix: String = "",
      exclude: Seq[String] = Nil, k: Int = 14): DataFrame = {
    var df = table.where(col("day") === day &&
      col("counter").startsWith(prefix))
    if (suffix.nonEmpty) df = df.where(col("counter").endsWith(suffix))
    if (exclude.nonEmpty) df = df.where(!col("counter").isin(exclude: _*))
    df.select(col("counter").as("name"), col("n").as("value"))
      .orderBy(col("value").desc, col("name")).limit(k)
  }

  /** T17: language-code enrichment with the reference's full fallback chain
    * (store.js:29-54 wiki, :66-91 wiktionary): strip the `wiki_` counter
    * prefix, remove the FIRST occurrence of the family suffix (JS
    * `.replace(family, "")` replaces first match only), then
    *   2-letter code → ISO-639-1 name, else the code;
    *   3-letter code → ISO-639-2B name, else ISO-639-3 name, else the code;
    *   any other length → the code.
    * Three broadcast joins against fixed-cardinality dims — the correct
    * 100 TB shape for enrichment.
    */
  def enrichLanguages(topWikis: DataFrame, family: String = "wiki"): DataFrame =
    CounterStore.enrichLanguages(spark, topWikis, family)

  /** T18: human descriptions + unit conversion (store.js:101-126; growth is
    * reported in MiB, ÷ 2^20).
    */
  def describe(counters: DataFrame): DataFrame =
    counters.select(
      col("name"),
      when(col("name") === "total", "Total events processed")
        .when(col("name") === "bot", "Bot edits")
        .when(col("name") === "minor", "Minor edits")
        .when(col("name") === "length_inc", "Edits adding content")
        .when(col("name") === "length_dec", "Edits removing content")
        .when(col("name") === "growth", "Net content growth (MiB)")
        .otherwise(col("name")).as("description"),
      when(col("name") === "growth", col("value") / 1048576.0d)
        .otherwise(col("value").cast("double")).as("display_value"),
      format_number(col("value"), 0).as("formatted"))
}

object CounterStore {

  /** Remove the FIRST occurrence of `sub` (JS `String.replace` with a
    * string pattern — the reference's suffix strip, store.js:30,67).
    */
  private def removeFirst(c: Column, sub: String): Column = {
    val at = instr(c, sub)
    when(at > 0,
      concat(substr(c, lit(1), at - 1), substr(c, at + sub.length, length(c))))
      .otherwise(c)
  }

  /** The enrichment chain on a (name, value) counter frame; see the class
    * method's doc. `family` is "wiki" or "wiktionary".
    */
  def enrichLanguages(spark: SparkSession, counters: DataFrame,
      family: String = "wiki"): DataFrame = {
    val code = removeFirst(regexp_replace(col("name"), "^wiki_", ""), family)
    counters
      .withColumn("code", code)
      .join(broadcast(Iso639.iso1Df(spark)), Seq("code"), "left")
      .join(broadcast(Iso639.iso2bDf(spark)), Seq("code"), "left")
      .join(broadcast(Iso639.iso3Df(spark)), Seq("code"), "left")
      .select(col("name"), col("value"),
        when(length(col("code")) === 2, coalesce(col("iso1_name"), col("code")))
          .when(length(col("code")) === 3,
            coalesce(col("iso2b_name"), col("iso3_name"), col("code")))
          .otherwise(col("code")).as("language"))
  }
}
