package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The interactive query surface over the counter aggregate store — the
  * reference's REST + dashboard queries (SURVEY §2.2 T9-T22) as a DataFrame
  * library. Reads prune on the `day` partition column exactly like the
  * reference's `day_<d>_*` key-prefix scans (`web/handler.go:126-135`).
  */
class CounterStore(spark: SparkSession, tableDir: String) {

  def table: DataFrame = spark.read.parquet(tableDir)

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

  /** T17: language-code enrichment — broadcast lookup join with fallback to
    * the raw code (store.js:29-54's ISO-639 join, as a tiny static dim).
    */
  def enrichLanguages(topWikis: DataFrame): DataFrame = {
    val iso = CounterStore.isoLookup(spark)
    topWikis
      .withColumn("code",
        regexp_replace(regexp_replace(col("name"), "^wiki_", ""), "wiki$", ""))
      .join(broadcast(iso), Seq("code"), "left")
      .select(col("name"), col("value"),
        coalesce(col("language"), col("code")).as("language"))
  }

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
  /** Static ISO-639-ish lookup dim (stand-in for the npm tables the
    * dashboard ships, store.js:4-6). Tiny → always broadcast.
    */
  def isoLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      "en" -> "English", "de" -> "German", "fr" -> "French",
      "es" -> "Spanish", "he" -> "Hebrew", "zh" -> "Chinese",
      "ja" -> "Japanese", "ru" -> "Russian", "pt" -> "Portuguese",
      "it" -> "Italian", "nl" -> "Dutch", "pl" -> "Polish",
      "ar" -> "Arabic", "ko" -> "Korean", "hi" -> "Hindi"
    ).toDF("code", "language")
  }
}
