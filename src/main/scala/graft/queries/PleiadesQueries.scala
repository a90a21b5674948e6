package graft.queries

import graft.Tables
import graft.operators.CounterDerivation
import org.apache.spark.sql.functions._

/** SURVEY §2.4 PQ1-PQ12 — the reference's own query semantics (counter
  * derivation, day bucketing, top-k, enrichment, formatting) re-expressed on
  * the synthetic `events` table so every one is DuckDB-oracle-checkable.
  * Reference traceability is on each member.
  */
object PleiadesQueries {
  import CounterDerivation.epochDay

  private val qDay = "CAST(floor(epoch(ts)/86400) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // PQ1 (T5+T6): event-time daily counts per type — the tumbling-day
    // grouped count at the heart of `kafka/aggregator.go:174-189`.
    QueryDef("pq01_daily_type_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(epochDay(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day", "event_type"),
      Some(s"""SELECT $qDay AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // PQ2 (T2): the conditional counter fan-out (aggregator.go:32-66
    // semantics) — one explode in Spark, UNION ALL of branches in the oracle.
    QueryDef("pq02_counter_fanout",
      (s, d) => CounterDerivation.dailyCounters(Tables.events(s, d))
        .orderBy("day", "counter"),
      Some(s"""WITH e AS (SELECT $qDay AS day, event_type, user_id, value FROM events)
              |SELECT day, counter, n FROM (
              |  SELECT day, 'total' AS counter, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY day
              |  UNION ALL
              |  SELECT day, 'type_' || event_type, CAST(COUNT(*) AS BIGINT) FROM e
              |    WHERE event_type IS NOT NULL AND event_type <> '' GROUP BY day, event_type
              |  UNION ALL
              |  SELECT day, 'bot', CAST(COUNT(*) AS BIGINT) FROM e WHERE user_id % 7 = 0 GROUP BY day
              |  UNION ALL
              |  SELECT day, 'minor', CAST(COUNT(*) AS BIGINT) FROM e WHERE value < 10 GROUP BY day
              |  UNION ALL
              |  SELECT day, CASE WHEN value >= 50 THEN 'value_inc' ELSE 'value_dec' END,
              |         CAST(COUNT(*) AS BIGINT) FROM e WHERE value IS NOT NULL GROUP BY 1, 2
              |) ORDER BY day, counter""".stripMargin)),

    // PQ3 (T7): the INCRBY pleiades_growth running sum as a per-day SUM.
    QueryDef("pq03_daily_growth",
      (s, d) => Tables.events(s, d)
        .groupBy(epochDay(col("ts")).as("day"))
        .agg(QueryDef.dsum(col("value")).as("growth"))
        .orderBy("day"),
      Some(s"""SELECT $qDay AS day, ${QueryDef.oSum("value")} AS growth
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PQ4 (T4): regex field extraction from the JSON payload
    // (aggregator.go:79-89's `"timestamp":(\d+)` pattern, on `props`).
    QueryDef("pq04_regex_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // PQ5 (T9/T13): day point query — counters of one day (broadcast scalar
    // join, not a collect, so it stays distributed at scale).
    QueryDef("pq05_day_point",
      (s, d) => {
        val e = Tables.events(s, d).withColumn("day", epochDay(col("ts")))
        val minDay = e.agg(min(col("day")).as("day"))
        e.join(broadcast(minDay), "day")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
              |WHERE $qDay = (SELECT MIN($qDay) FROM events)
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PQ6 (T12): distinct-day listing with the quality floor (the reference's
    // `day > 18488` guard, web/handler.go:190, transposed to this dataset).
    QueryDef("pq06_distinct_days",
      (s, d) => Tables.events(s, d)
        .select(epochDay(col("ts")).as("day"))
        .where(col("day") > 19725).distinct().orderBy("day"),
      Some(s"""SELECT DISTINCT $qDay AS day FROM events
              |WHERE $qDay > 19725 ORDER BY day""".stripMargin)),

    // PQ7 (T15): top-k (k=14, store.js:23-27) — TakeOrderedAndProject.
    QueryDef("pq07_topk",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type")).limit(14),
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
             |GROUP BY 1 ORDER BY n DESC, event_type LIMIT 14""".stripMargin)),

    // PQ8 (T14): prefix/suffix/inequality predicates (store.js:21-23).
    QueryDef("pq08_prefix_filter",
      (s, d) => Tables.events(s, d)
        .where(col("event_type").like("%e%") &&
          !col("event_type").like("%w") && col("event_type") =!= "error")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
             |WHERE event_type LIKE '%e%' AND event_type NOT LIKE '%w'
             |  AND event_type <> 'error'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PQ9 (T17): broadcast lookup enrichment (the ISO-639 join,
    // store.js:29-54) — nation as the small dim.
    QueryDef("pq09_enrich_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val n = Tables.nation(s, d)
        e.join(broadcast(n), e("user_id") % 25 === n("n_nationkey"))
          .groupBy("event_type", "n_name").agg(count(lit(1)).as("n"))
          .orderBy("event_type", "n_name")
      },
      Some("""SELECT e.event_type, n.n_name, CAST(COUNT(*) AS BIGINT) AS n
             |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // PQ10 (T18): case/when description mapping + MiB unit conversion
    // (store.js:101-126; ÷1048576 at :111 — 2^20 is exact in double).
    QueryDef("pq10_describe_convert",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(QueryDef.dsum(col("value")).as("total"))
        .select(
          col("event_type"),
          when(col("event_type") === "purchase", "Purchase event")
            .when(col("event_type") === "error", "Error event")
            .otherwise(col("event_type")).as("description"),
          (col("total") / 1048576.0d).as("mib"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type,
              |  CASE event_type WHEN 'purchase' THEN 'Purchase event'
              |                  WHEN 'error' THEN 'Error event'
              |                  ELSE event_type END AS description,
              |  ${QueryDef.oSum("value")} / 1048576.0 AS mib
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // PQ11 (T21): epoch-day → ISO date string (store.js:187-192).
    QueryDef("pq11_day_format",
      (s, d) => Tables.events(s, d)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .distinct().orderBy("d"),
      Some("""SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d FROM events ORDER BY d""")),

    // PQ12 (T3): derived delta column with null coalescing
    // (lendiff, aggregator.go:57-64).
    QueryDef("pq12_delta",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), coalesce(col("value"), lit(0.0d)).as("delta"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(COALESCE(value, 0) AS DOUBLE) AS delta
             |FROM events ORDER BY event_id""".stripMargin)),

    // PQ13: gap-based sessionization (batch twin of the
    // flatMapGroupsWithState operator, graft.streaming.Sessionize) —
    // lag + cumulative-sum windows, 30-minute gap.
    QueryDef("pq13_sessionize",
      (s, d) => graft.streaming.Sessionize.batch(
        Tables.events(s, d).select(col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("value")),
        gapSeconds = 1800L)
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value FROM events),
             |b AS (SELECT user_id, ts_sec, value,
             |    CASE WHEN lag(ts_sec) OVER w IS NULL
             |              OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec)),
             |sess AS (SELECT user_id, ts_sec, value,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_sec
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM b)
             |SELECT user_id, CAST(MIN(ts_sec) AS BIGINT) AS session_start,
             |       CAST(MAX(ts_sec) AS BIGINT) AS session_end,
             |       CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // PQ15: sliding event-time windows (2h length, 1h slide) — each event
    // lands in exactly two windows; the oracle spells the window assignment
    // as a UNION ALL of the two shifted hour-starts.
    QueryDef("pq15_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("event_type"), col("n"))
        .orderBy("ws", "event_type"),
      Some("""WITH e AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS h, event_type FROM events),
             |w AS (SELECT h - 3600 AS ws, event_type FROM e
             |      UNION ALL SELECT h AS ws, event_type FROM e)
             |SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n
             |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)),

    // PQ16: conversion funnel — users whose first 'signup' precedes a later
    // 'purchase' (sequence matching over the event stream; the dashboard
    // class of query the reference's product would grow into).
    QueryDef("pq16_funnel",
      (s, d) => {
        // One scan, one exchange (r15): "any purchase strictly after the
        // first signup" is max(purchase_ts) > min(signup_ts), so both
        // funnel stages fall out of a single conditional aggregate per
        // user — the previous two-branch form scanned events twice and
        // shuffled a user join plus a distinct on top of it.
        val perUser = Tables.events(s, d)
          .where(col("event_type").isin("signup", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_sec"))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", col("ts_sec")))
              .as("signup_ts"),
            max(when(col("event_type") === "purchase", col("ts_sec")))
              .as("last_purchase_ts"))
          .where(col("signup_ts").isNotNull)
        perUser
          .agg(count(lit(1)).as("signed_up"),
            // coalesce: on an input with zero signup users the global agg
            // yields sum(...) = NULL while the oracle's COUNT over an empty
            // CTE yields 0 (r15 ADVICE)
            coalesce(sum(when(col("last_purchase_ts") > col("signup_ts"), 1L)
              .otherwise(0L)), lit(0L)).as("converted"))
          .select(explode(array(
            struct(lit("converted").as("stage"), col("converted").as("n_users")),
            struct(lit("signed_up").as("stage"), col("signed_up").as("n_users"))))
            .as("r"))
          .select(col("r.stage").as("stage"), col("r.n_users").as("n_users"))
          // the global aggregate is a single partition and the struct array
          // is emitted already stage-ordered, so an in-partition sort is a
          // total order — orderBy here cost a range-partitioner sampling
          // job on a 2-row frame (one whole dispatch floor at every SF)
          .sortWithinPartitions("stage")
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
             |su AS (SELECT user_id, MIN(ts_sec) AS signup_ts FROM e
             |       WHERE event_type = 'signup' GROUP BY user_id),
             |conv AS (SELECT DISTINCT e.user_id FROM e JOIN su ON e.user_id = su.user_id
             |         WHERE e.event_type = 'purchase' AND e.ts_sec > su.signup_ts)
             |SELECT 'signed_up' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM su
             |UNION ALL
             |SELECT 'converted' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM conv
             |ORDER BY stage""".stripMargin)),

    // PQ17: cohort retention — users grouped by first-seen day; how many
    // are active again exactly N days later.
    QueryDef("pq17_cohort_retention",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), epochDay(col("ts")).as("day"))
        val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        e.join(cohort, "user_id")
          .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_n"),
            col("user_id"))
          .where(col("day_n").isin(0L, 1L, 7L))
          .groupBy("cohort_day", "day_n")
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_day", "day_n")
      },
      Some(s"""WITH e AS (SELECT user_id, $qDay AS day FROM events),
              |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
              |SELECT c.cohort_day, e.day - c.cohort_day AS day_n,
              |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
              |FROM e JOIN c ON e.user_id = c.user_id
              |WHERE e.day - c.cohort_day IN (0, 1, 7)
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // PQ14: latest-event-per-key lookup (max_by / arg_max — the reference's
    // resume-ID recovery picks the max-timestamp message the same way,
    // kafkapublisher.go:157-211).
    QueryDef("pq14_latest_per_user",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(max_by(col("event_type"), col("event_id")).as("last_type"),
          max(col("event_id")).as("last_event"))
        .orderBy("user_id"),
      Some("""SELECT user_id, arg_max(event_type, event_id) AS last_type,
             |       MAX(event_id) AS last_event
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // PQ18 (T17 full fidelity): ISO-639 enrichment chain — 2-letter codes
    // via 639-1, 3-letter via 639-2B with 639-3 fallback, raw-code default,
    // first-occurrence family-suffix strip, wiki AND wiktionary families
    // (store.js:29-91). Synthetic counter names derived from events cover
    // every leg: known 2-letter (en/de/fr/ru), unknown 2-letter (zz),
    // 639-2B hit (chr/nds/ceb), 639-3-only (bcl), unknown 3-letter (xyz),
    // and other lengths (simple/bat_smg). The oracle's lookup tables are
    // rendered from the SAME static data (Iso639.sqlValues), so the check
    // exercises the chain logic, not a transcription.
    QueryDef("pq18_iso639_enrichment",
      (s, d) => {
        val codes = Seq("en", "de", "fr", "ru", "zz", "chr", "nds", "ceb",
          "bcl", "xyz", "simple", "bat_smg")
        val codeArr = array(codes.map(lit): _*)
        val named = Tables.events(s, d)
          .where(col("user_id").isNotNull)
          .select(concat(lit("wiki_"),
            element_at(codeArr, (col("user_id") % codes.size).cast("int") + 1),
            when(col("user_id") % 5 < 3, lit("wiki"))
              .otherwise(lit("wiktionary"))).as("name"))
        val counters = named.groupBy("name").agg(count(lit(1)).as("value"))
        val wikis = graft.streaming.CounterStore.enrichLanguages(
          s, counters.where(col("name").endsWith("wiki")), "wiki")
        val wikts = graft.streaming.CounterStore.enrichLanguages(
          s, counters.where(col("name").endsWith("wiktionary")), "wiktionary")
        wikis.unionByName(wikts)
          .select(col("name"), col("value").as("n"), col("language"))
          .orderBy("name")
      },
      Some({
        import graft.streaming.Iso639
        val codeVals = Seq("en", "de", "fr", "ru", "zz", "chr", "nds", "ceb",
          "bcl", "xyz", "simple", "bat_smg")
          .zipWithIndex.map { case (c, i) => s"($i, '$c')" }.mkString(", ")
        s"""WITH iso1(code, name1) AS (VALUES ${Iso639.sqlValues(Iso639.iso1)}),
           |iso2b(code, name2) AS (VALUES ${Iso639.sqlValues(Iso639.iso2b)}),
           |iso3(code, name3) AS (VALUES ${Iso639.sqlValues(Iso639.iso3)}),
           |codes(i, code) AS (VALUES $codeVals),
           |named AS (SELECT 'wiki_' || c.code ||
           |            (CASE WHEN e.user_id % 5 < 3 THEN 'wiki' ELSE 'wiktionary' END) AS name
           |          FROM events e JOIN codes c ON e.user_id % 12 = c.i
           |          WHERE e.user_id IS NOT NULL),
           |counters AS (SELECT name, CAST(COUNT(*) AS BIGINT) AS n FROM named GROUP BY 1),
           |fam AS (SELECT name, n,
           |          CASE WHEN name LIKE '%wiktionary' THEN 'wiktionary' ELSE 'wiki' END AS family,
           |          substr(name, 6) AS c0
           |        FROM counters),
           |cod AS (SELECT name, n,
           |          CASE WHEN strpos(c0, family) > 0
           |               THEN substr(c0, 1, strpos(c0, family) - 1) ||
           |                    substr(c0, strpos(c0, family) + length(family))
           |               ELSE c0 END AS code
           |        FROM fam)
           |SELECT cod.name, n,
           |       CASE WHEN length(cod.code) = 2 THEN COALESCE(i1.name1, cod.code)
           |            WHEN length(cod.code) = 3 THEN COALESCE(i2.name2, i3.name3, cod.code)
           |            ELSE cod.code END AS language
           |FROM cod LEFT JOIN iso1 i1 ON cod.code = i1.code
           |         LEFT JOIN iso2b i2 ON cod.code = i2.code
           |         LEFT JOIN iso3 i3 ON cod.code = i3.code
           |ORDER BY cod.name""".stripMargin
      }))
  )
}
