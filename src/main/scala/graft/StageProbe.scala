package graft

import graft.operators._
import graft.operators.CacheRegistry.Cacheable
import graft.queries.QueryDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-stage wall-clock breakdown of the bench's most expensive queries —
  * the evidence behind BASELINE.md's floor-profile / fix decisions. Each
  * probe materializes a query's internal stages in the SAME persist
  * structure the real query uses (tracked caches left in place between
  * stages of one probe, released between probes), so a stage's time is its
  * incremental cost and the stage rows of one probe sum to ~the query's
  * solo time.
  *
  * Usage: runMain graft.StageProbe <sfDir> [probe1,probe2,...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "stage-probe")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Per-materialization Spark-stage accounting (round 18, the xq38/xq39
    // 32-core-collapse diagnosis): sums task metrics over every stage that
    // completes inside the timed window, plus the count of stages/tasks —
    // when `wall >> executorRunTime/cores`, the time is NOT in tasks
    // (scheduling, planning, JIT); when gcTime spikes, it is allocation.
    val stageAgg = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, Long, Long)]() // (numTasks, executorRunTime, jvmGCTime, shuffleReadMs)
    val stageDetail = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Int, Long)]() // (stage name, numTasks, executorRunTime)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          stageAgg.add((sc.stageInfo.numTasks, m.executorRunTime,
            m.jvmGCTime, m.shuffleReadMetrics.fetchWaitTime))
          stageDetail.add((sc.stageInfo.name.takeWhile(_ != '\n').take(70),
            sc.stageInfo.numTasks, m.executorRunTime))
        }
      })
    // set GRAFT_STAGE_DETAIL=1 to print the slowest stages of each timed row
    val wantDetail = sys.env.get("GRAFT_STAGE_DETAIL").contains("1")
    def timed(label: String)(df: => DataFrame): Double = {
      stageAgg.clear()
      val t0 = System.nanoTime()
      noop(df)
      val s = (System.nanoTime() - t0) / 1e9
      // listener events are async — drain before reading
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(
        spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val st = stageAgg.asScala.toSeq
      println(f"STAGE  $label%-34s ${s}%8.2f s  " +
        f"[stages=${st.size}%d tasks=${st.map(_._1).sum}%d " +
        f"run=${st.map(_._2).sum / 1e3}%.2fs gc=${st.map(_._3).sum / 1e3}%.2fs " +
        f"fetchWait=${st.map(_._4).sum / 1e3}%.2fs]")
      if (wantDetail) {
        stageDetail.asScala.toSeq.sortBy(-_._3).take(6).foreach {
          case (n, t, r) => println(f"  SUBSTAGE ${r / 1e3}%6.2fs tasks=$t%-4d $n")
        }
      }
      stageDetail.clear()
      s
    }
    def probe(name: String)(body: => Unit): Unit =
      if (only.isEmpty || only(name)) {
        println(s"===== $name @ $sf =====")
        body
        CacheRegistry.releaseAll(spark)
      }

    // one warm pass at smoke scale so JIT/codegen is out of the stage rows
    val warm = "/root/testdata/sf0.001"
    Seq("xq95_training_shards", "xq93_crossmodal_dups", "xq47_semdedup",
      "xq44_bm25", "xq24_decontaminate", "rq18_cte_selfjoin",
      "rq29_range_join").foreach { q =>
      try noop(SparkEntry.queries(q)(spark, warm))
      catch { case _: Throwable => () }
    }
    CacheRegistry.releaseAll(spark)

    probe("xq95") {
      val docs = Tables.documents(spark, sf)
      val vocab = Vocabulary.build(docs, "text", minCount = 5L)
      timed("vocab (tokenize+count+rank)")(vocab)
      val ids = Vocabulary.mapTokens(docs, "text", "doc_id", vocab)
      timed("map_tokens (re-tokenize+join)")(ids)
      timed("manifest (full query)")(
        SparkEntry.queries("xq95_training_shards")(spark, sf))
    }

    probe("xq93") {
      val docs = Tables.documents(spark, sf)
      timed("text pair search")(
        Dedup.minhashCandidatePairs(docs, "text", "doc_id"))
      timed("image pair search (decode+band)")(
        Multimodal.imageNearDupPairs(
          Multimodal.imageHashes(spark, Multimodal.imageAssets(docs))))
      timed("merge (full query)")(
        SparkEntry.queries("xq93_crossmodal_dups")(spark, sf))
    }

    probe("xq47") {
      val emb = Tables.embeddings(spark, sf)
      val cents = Similarity.kmeansFit(emb, "embedding", "vec_id", 8, 2)
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"),
          col("centroid_val")))), x => x.getField("centroid_val")).as("cvec"))
      timed("kmeans fit (k=8, 2 iters)")(cents)
      timed("assign")(
        Similarity.assignToCentroids(emb, "embedding", "vec_id", cents))
      timed("in-cluster pairs (full query)")(
        SparkEntry.queries("xq47_semdedup")(spark, sf))
      // the scale-right configuration — since round 7 the API DEFAULT
      // (semDedup k=0 derives k = N/625 via semDedupK) instead of the
      // oracle-pinned k=8: per-cluster pair volume stays constant as N grows
      CacheRegistry.releaseAll(spark)
      timed(s"scaled k (default, k=${Similarity.semDedupK(emb)})")(
        Similarity.semDedup(Tables.embeddings(spark, sf), "embedding",
          "vec_id", iters = 2, threshold = 0.25d))
    }

    probe("xq44") {
      val docs = Tables.documents(spark, sf)
      timed("tf (explode+count)")(docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
      timed("bm25 score (full query)")(
        SparkEntry.queries("xq44_bm25")(spark, sf))
    }

    // xq44 decomposition round 11: the strict row reads 9.4 s / 2.8x at
    // sf5 over three full-stream exchanges — (doc,term) tf aggregate,
    // doc-keyed dl window, term-keyed df+rank window. Two candidates, both
    // exchange-removals: (a) dl is just the doc's token count, computable
    // map-side BEFORE the explode (first(dl) rides the tf aggregate, the
    // doc window disappears); (b) df is VOCABULARY-bounded (distinct
    // terms, not corpus rows) so a groupBy df table can broadcast into the
    // scored stream — xq48's gate, same reasoning. The rank window's
    // term exchange stays either way (top-3-per-term needs it).
    probe("xq44v") {
      val docs = Tables.documents(spark, sf)
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      val wTerm = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))
      val tfCur = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .trackedCache
      timed("cur: tf agg")(tfCur)
      timed("cur: + dl window")(
        tfCur.withColumn("dl", sum(col("tf")).over(wDoc)))
      timed("cur: + dl + df window")(
        tfCur.withColumn("dl", sum(col("tf")).over(wDoc))
          .withColumn("df", count(lit(1)).over(wTerm)))
      CacheRegistry.releaseAll(spark)
      val tfRow = docs
        .select(col("doc_id"),
          explode(graft.expressions.TermCounts(col("text"))).as("_t"))
        .select(col("doc_id"), col("_t.term").as("term"),
          col("_t.tf").as("tf"), col("_t.dl").as("dl"))
        .trackedCache
      timed("alt: row-local TermCounts stream")(tfRow)
      timed("alt: + broadcast df join")(
        tfRow.join(broadcast(
          tfRow.groupBy(col("term")).agg(count(lit(1)).as("df"))),
          Seq("term")))
      // Cold decomposition mirroring the shipped query's own job order
      // (tracked caches shared across rows, as in the query).
      CacheRegistry.releaseAll(spark)
      val t0 = System.nanoTime()
      val scored = Ranking.bm25(docs, "text", "doc_id")
      println(f"STAGE  ${"new: bm25() incl. df gate+corpus"}%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      timed("new: + scored pass (no agg)")(scored)
      // same per-query conf the shipped xq44 declares (hash-resident top-k)
      queries.QueryDef.applyConfs(spark, Seq(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
          -> "10000000"))
      timed("new: + topk agg")(
        scored.groupBy(col("term"))
          .agg(graft.expressions.TopKRows(
            struct(col("bm25"), col("doc_id"), col("tf")), 3,
            Seq(true, false)).as("_top")))
      timed("new: full query (warm cache)")(
        SparkEntry.queries("xq44_bm25")(spark, sf))
      CacheRegistry.releaseAll(spark)
      timed("new: full query (cold)")(
        SparkEntry.queries("xq44_bm25")(spark, sf))
    }

    probe("xq24") {
      val docs = Tables.documents(spark, sf)
      timed("train shingles (hash+distinct)")(
        Shingles.hashed(docs.where(col("source") =!= "src0"),
          "text", "doc_id", 3).distinct())
      timed("overlap (full query)")(
        SparkEntry.queries("xq24_decontaminate")(spark, sf))
    }

    probe("rq18") {
      timed("full")(SparkEntry.queries("rq18_cte_selfjoin")(spark, sf))
    }

    // rq02 decomposition (round 9): TPC-H Q1 reads 13.1x at sf5 — is that
    // the parquet scan or the decimal-routed aggregation? Stage rows: scan
    // floor (count over the same columns), raw double sums (NOT
    // deterministic — probe-only lower bound), the shipped decimal form,
    // and the cents-quantized long form (posture 3: exact integer sums,
    // one final division — bit-identical to the decimal route because both
    // compute the same exact rational sum then round once).
    probe("rq02") {
      val li = Tables.lineitem(spark, sf).select("l_returnflag",
        "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      timed("scan floor (count-shaped agg)")(
        li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n")))
      timed("double sums (nondeterministic LB)")(
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax"))),
            avg("l_quantity"), count(lit(1))))
      def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        floor(c * lit(100.0d) + lit(0.5d)).cast("long")
      timed("cents-long sums (posture 3)")(
        li.groupBy("l_returnflag", "l_linestatus")
          .agg((sum(col("l_quantity").cast("long")).cast("double")).as("sum_qty"),
            (sum(cents(col("l_extendedprice"))).cast("double") / lit(100.0d))
              .as("sum_base_price"),
            (sum(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount")))).cast("double")
              / lit(10000.0d)).as("sum_disc_price"),
            (sum(cents(col("l_extendedprice")) *
              (lit(100L) - floor(col("l_discount") * 100.0d + 0.5d).cast("long")) *
              (lit(100L) + floor(col("l_tax") * 100.0d + 0.5d).cast("long")))
              .cast("double") / lit(1000000.0d)).as("sum_charge"),
            (sum(col("l_quantity").cast("long")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")))
      // overflow-safe hybrid: per-row exact integer product in LONG
      // (codegen-cheap), summed as DECIMAL(38,0) (no 2^63 ceiling at
      // 100 TB group sizes), scale moved in decimal, ONE final cast
      val centsQ = floor(col("l_extendedprice") * 100.0d + 0.5d).cast("long")
      val dQ = lit(100L) - floor(col("l_discount") * 100.0d + 0.5d).cast("long")
      val tQ = lit(100L) + floor(col("l_tax") * 100.0d + 0.5d).cast("long")
      timed("long-product + decimal38 sums")(
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("long")).cast("double").as("sum_qty"),
            (sum(centsQ.cast(DecimalType(38, 0))) / lit(100))
              .cast("double").as("sum_base_price"),
            (sum((centsQ * dQ).cast(DecimalType(38, 0))) / lit(10000))
              .cast("double").as("sum_disc_price"),
            (sum((centsQ * dQ * tQ).cast(DecimalType(38, 0))) / lit(1000000))
              .cast("double").as("sum_charge"),
            (sum(col("l_quantity").cast("long")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")))
      // split-long exact sums: per-row product stays a LONG, summed as TWO
      // long sums (hi = x / 1e6, lo = x % 1e6; S = 1e6·Σhi + Σlo exactly,
      // recombined per GROUP in decimal for the one final cast) — long-sum
      // speed with ~9e12-rows-per-group overflow headroom
      def splitSum(x: org.apache.spark.sql.Column, scaleDiv: Long) = {
        val hi = sum((x / lit(1000000L)).cast("long")).cast(DecimalType(38, 0))
        val lo = sum(pmod(x, lit(1000000L))).cast(DecimalType(38, 0))
        ((hi * lit(1000000L) + lo) / lit(scaleDiv)).cast("double")
      }
      timed("split-long product sums")(
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("long")).cast("double").as("sum_qty"),
            splitSum(centsQ, 100L).as("sum_base_price"),
            splitSum(centsQ * dQ, 10000L).as("sum_disc_price"),
            splitSum(centsQ * dQ * tQ, 1000000L).as("sum_charge"),
            (sum(col("l_quantity").cast("long")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")))
      timed("full rq02 (decimal route)")(
        SparkEntry.queries("rq02_tpch_q1")(spark, sf))
      timed("full rq02 again")(
        SparkEntry.queries("rq02_tpch_q1")(spark, sf))
    }

    // rq29 decomposition (round 9): the suspects are (a) the input scans,
    // (b) the bin explode + equi-join + exact-predicate candidate pass,
    // (c) the two-phase countDistinct aggregate over the join output. The
    // join-output cardinality is printed alongside: at the replicated SFs
    // each window key repeats ~SF/0.1 times, so the pair count (and
    // therefore any engine's enumerate-the-overlaps cost) grows
    // quadratically-with-replication — the adjudication needs that number
    // on record.
    probe("rq29") {
      val epoch = lit("1970-01-01").cast("date")
      val w = Tables.orders(spark, sf)
        .where(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey").as("window_id"),
          datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("ws"))
        .withColumn("we", col("ws") + lit(29L))
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"),
          datediff(col("l_shipdate").cast("date"), epoch).cast("long").as("ls"),
          floor(col("l_quantity")).as("qd"))
        .withColumn("le", col("ls") + col("qd"))
        .drop("qd")
      timed("scan: windows")(w)
      timed("scan: lineitem intervals")(li)
      val joined = RangeJoin.overlapJoin(li, w, "ls", "le", "ws", "we",
        binWidth = 32L)
      timed("bin join (explode+equi+pred)")(joined)
      println(f"STAGE  join output pairs${""}%-17s ${joined.count()}%12d")
      // the window-grouped metrics alone (count/min collapse map-side to
      // ~150 groups — no exchange to speak of): everything the full query
      // pays beyond this row is the exact (window, order) distinct
      timed("join + window-grouped agg only")(
        joined.groupBy("window_id")
          .agg(count(lit(1)).as("n_lines"), min(col("ls")).as("first_ship_day")))
      timed("join + distinct-bearing aggs")(
        joined.groupBy("window_id", "l_orderkey")
          .agg(count(lit(1)).as("c"), min(col("ls")).as("mls"))
          .groupBy("window_id")
          .agg(sum(col("c")).as("n_lines"), count(lit(1)).as("n_orders"),
            min(col("mls")).as("first_ship_day")))
      // interval-union n_orders: a window (fixed length 29) overlaps a line
      // iff ws ∈ [ls-29, le], so an ORDER overlaps iff ws falls in the
      // UNION of its lines' shifted intervals — merge them with the shipped
      // window-sweep operator (round 11: replaced the collect_list array
      // fold, sf5 union branch 7.13 -> 4.20 s), then count merged intervals
      // containing each of the ~150 distinct window starts via the
      // point-in-interval join: the distinct never materializes
      val merged = RangeJoin.mergeIntervals(
        li.select(col("l_orderkey"), (col("ls") - lit(29L)).as("ms"),
          col("le").as("me")), "l_orderkey", "ms", "me")
      timed("order interval-union build")(merged)
      val nOrders = RangeJoin.pointInIntervalJoin(
        w.select("window_id", "ws"), merged, "ws", "ms", "me", binWidth = 32L)
        .groupBy("window_id").agg(count(lit(1)).as("n_orders"))
      timed("union-build + point-count n_orders")(nOrders)
      val aggA = joined.groupBy("window_id")
        .agg(count(lit(1)).as("n_lines"), min(col("ls")).as("first_ship_day"))
      timed("assembled union-scheme query")(
        aggA.join(nOrders, "window_id").orderBy("window_id"))
      timed("full (join+agg+sort)")(SparkEntry.queries("rq29_range_join")(spark, sf))
      timed("full again (steady state)")(SparkEntry.queries("rq29_range_join")(spark, sf))
      // the two production branches behind rq29's size gate, forced
      timed("rq29Plan forced DEFAULT branch")(
        graft.queries.RelationalQueries.rq29Plan(spark, sf, Some(false)))
      timed("rq29Plan forced UNION branch")(
        graft.queries.RelationalQueries.rq29Plan(spark, sf, Some(true)))
    }

    // xq109 decomposition (round 14): the production bloom-probe row reads
    // >2x vs DuckDB's plain vectorized join at sf5 — the stage rows split
    // Spark's side into (a) the bare 3-column fact scan (the floor no
    // plan can beat), (b) scan + fast-bloom probe (xxhash64 + literal-array
    // mask test, join-free), (c) the md5 probe it replaced, (d) the full
    // query (probe + broadcast join + agg).
    probe("xq109") {
      import org.apache.spark.sql.functions.{col => c}
      val li = Tables.lineitem(spark, sf)
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val dim = Tables.part(spark, sf).where(c("p_size") < 5)
      timed("bare fact scan (3 cols)")(li)
      timed("scan + fast bloom probe")(
        ScaleJoins.bloomFilteredFast(li, "l_partkey", dim, "p_partkey", 61440L))
      timed("scan + md5 bloom probe (old)")(
        ScaleJoins.bloomFiltered(li, "l_partkey", dim, "p_partkey", 61440L))
      timed("plain broadcast join + agg (no bloom)")(
        li.join(dim.select("p_partkey", "p_brand"),
            c("l_partkey") === c("p_partkey"))
          .groupBy("p_brand").agg(count(lit(1)).as("n_rows")))
      timed("full query")(SparkEntry.queries("xq109_bloom_join")(spark, sf))
    }

    // rq48-52 decomposition (round 14): with coherent dims the TPC-H
    // classics measure real join growth and read 2.1-7.2x at sf5 — the
    // stage rows separate the scan/derivation floors from the join chain,
    // and the plan dump shows which joins went broadcast vs shuffle.
    probe("rq49") {
      import org.apache.spark.sql.functions.{col => c}
      val li = Tables.lineitem(spark, sf)
        .select("l_partkey", "l_orderkey", "l_suppkey",
          "l_extendedprice", "l_discount")
      val promo = Tables.part(spark, sf).where(c("p_type") === "PROMO")
        .select("p_partkey")
      timed("lineitem scan (5 cols)")(li)
      timed("li >< part(PROMO)")(
        li.join(promo, c("l_partkey") === c("p_partkey")))
      timed("li >< broadcast part(PROMO)")(
        li.join(broadcast(promo), c("l_partkey") === c("p_partkey")))
      val ordersF = Tables.orders(spark, sf)
        .where(c("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          c("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val cut = li.join(broadcast(promo), c("l_partkey") === c("p_partkey"))
      timed("cut >< orders (SMJ default)")(
        cut.join(ordersF, c("l_orderkey") === c("o_orderkey")))
      timed("cut >< orders (SHUFFLE_HASH hint)")(
        cut.join(ordersF.hint("SHUFFLE_HASH"),
          c("l_orderkey") === c("o_orderkey")))
      val q = SparkEntry.queries("rq49_tpch_q8")(spark, sf)
      timed("full query")(q)
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("PLAN JOINS/EXCHANGES:\n", "\n", ""))
    }

    // xq48 decomposition (round 11): strict bigram-LM quality scoring at
    // sf5 reads 2.56x — the suspects are (a) the train-side bigram
    // generate + (w1,w2) count aggregate, (b) the scored-side bigram
    // stream, (c) the two string-keyed scoring joins, (d) the doc-keyed
    // quantized-NLL aggregate. Stage rows decide whether the cost is the
    // string bigram shuffle (hash-keying would help) or the generate/agg
    // floors (it would not).
    probe("xq48") {
      import org.apache.spark.sql.functions.{col => c}
      val docs = Tables.documents(spark, sf)
      val train = docs.where(c("source") === "src0")
      val scored = docs.where(c("source") =!= "src0")
      def bg(df: org.apache.spark.sql.DataFrame) =
        df.select(c("doc_id"),
            explode(graft.expressions.TokenBigrams(c("text"))).as("_b"))
          .select(c("doc_id"), c("_b.w1").as("w1"), c("_b.w2").as("w2"))
      timed("train bigram generate")(bg(train))
      val c12 = bg(train).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      timed("c12 count aggregate")(c12)
      timed("scored bigram generate")(bg(scored))
      timed("score joins + doc agg (full)")(
        SparkEntry.queries("xq48_lm_quality")(spark, sf))
      timed("full again (steady state)")(
        SparkEntry.queries("xq48_lm_quality")(spark, sf))
    }

    // xq88/xq94 audio decomposition (round 9): both are map-only decode
    // chains (ScanPlanSpec), so the stage rows isolate (a) the text scan +
    // UTF-8 bytes, (b) the WAV container encode (2x byte expansion +
    // header), (c) the javax.sound RIFF parse + PCM frame read, (d) the
    // full per-sample stats/trim loops + sort. (b)-(a) and (c)-(b) are the
    // codec costs the "decode-bound linear" adjudication claims — this
    // puts numbers on them.
    probe("xq88") {
      val docs = Tables.documents(spark, sf)
      timed("text scan + utf8 bytes")(
        docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("raw")))
      val assets = Multimodal.audioAssets(docs)
      timed("+ wav container encode")(assets.select("doc_id", "n_bytes"))
      val parsed = {
        val sp = spark
        import sp.implicits._
        assets.select("doc_id", "payload").as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, p) =>
            val (rate, _, dataLen) = Multimodal.readPcm16(p)
            (id, rate, dataLen)
          }).toDF("doc_id", "rate", "n")
      }
      timed("+ riff parse + pcm read")(parsed)
      timed("full xq88 (stats loop + sort)")(
        SparkEntry.queries("xq88_audio_features")(spark, sf))
      timed("full xq94 (trim loop + sort)")(
        SparkEntry.queries("xq94_audio_trim")(spark, sf))
    }

    // xq23 per-doc top-terms is map-only by spec (ScanPlanSpec) — the only
    // candidate costs are the parquet text decode, the native TopTerms
    // count+rank pass, and the output's global sort (the one exchange, on
    // ~3 rows/doc). Stage rows separate the three so the sf5 2.29x row can
    // be adjudicated scan-constant (or not) with numbers.
    probe("xq23") {
      val docs = Tables.documents(spark, sf)
      timed("text decode (scan floor)")(
        docs.select(col("doc_id"), length(col("text")).as("len")))
      timed("top-terms map (no sort)")(
        docs.select(col("doc_id"),
          explode(graft.expressions.TopTerms(col("text"), 3)).as("_t"))
          .select(col("doc_id"), col("_t.rk").as("rk"),
            col("_t.term").as("term"), col("_t.tf").as("tf")))
      timed("full query (with global sort)")(
        SparkEntry.queries("xq23_top_terms")(spark, sf))
    }

    // xq100 df-capped containment: mirror the round-8 pruned path stage by
    // stage (same persist structure: sh cached, survivors cached). The
    // round-7 shape — candidates straight into the hot fan-out — measured
    // 18.9M pairs × ~30 hot shingles = 579M join rows (76.9 s of the 79 s
    // row); the bound prune below (c_cold + min(ha,hb)) / min(na,nb) cuts
    // candidates to the survivors before any hot shingle is touched.
    probe("xq100") {
      import graft.operators.CacheRegistry.Cacheable
      val maxDf = 50L
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      val excerpts = Tables.documents(spark, sf)
        .where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 5, 24), " ").as("text"))
      val sh = Shingles.hashed(docs.unionByName(excerpts), "text", "doc_id", 3)
        .distinct().trackedCache
      timed("shingles distinct (cached)")(sh)
      val hotKeys = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df") > maxDf).select("shingle")
      timed("hot keys")(hotKeys)
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      val cold = sh.join(hotKeys, Seq("shingle"), "left_anti")
        .select(col("doc_id"), col("shingle"))
        .repartition(nShuffle, col("shingle"))
      val hot = sh.join(hotKeys, Seq("shingle"), "left_semi")
        .select(col("doc_id"), col("shingle"))
      val coldCounts = cold.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(cold.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c_cold"))
      timed("cold pair self-join")(coldCounts)
      println(f"STAGE  shingle rows / candidate pairs  " +
        f"${sh.count()}%d / ${coldCounts.count()}%d")
      val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        .join(hot.groupBy("doc_id").agg(count(lit(1)).as("n_hot")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_hot"), lit(0L)).as("n_hot"))
      val pruned = coldCounts
        .join(perDoc.toDF("doc_a", "na", "ha"), "doc_a")
        .join(perDoc.toDF("doc_b", "nb", "hb"), "doc_b")
        .where((col("c_cold") + least(col("ha"), col("hb"))).cast("double") >=
          lit(0.9) * least(col("na"), col("nb")).cast("double"))
        .trackedCache
      timed("bound prune (cached)")(pruned)
      val hotCounts = pruned.select("doc_a", "doc_b")
        .join(hot.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
        .join(hot.select(col("doc_id").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c_hot"))
      timed("hot add on survivors")(hotCounts)
      timed("full query")(
        SparkEntry.queries("xq100_containment_capped")(spark, sf))
    }

    // rq52 decomposition (round 15): the one sfN row still >2x after the
    // r15 plan passes. Stages split the unavoidable pieces — 3-col fact
    // scan, the canonical l_orderkey exchange of those columns, the
    // status-F orders scan — from the actual query work (SHJ join, the
    // stacked (orderkey,suppkey)->orderkey aggregates). The adjudication
    // claim is "query ~= exchange floor + join/agg work with no wasted
    // exchange": the groupBys ride the join's partitioning (one fact
    // exchange total), verified in the plan dump below.
    probe("rq52") {
      import org.apache.spark.sql.functions.{col => c}
      val li3 = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val ordersF = Tables.orders(spark, sf)
        .where(c("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      timed("lineitem scan (3 cols)")(li3)
      timed("scan + orderkey exchange")(li3.repartition(c("l_orderkey")))
      timed("orders(F) scan")(ordersF)
      val joined = li3.join(ordersF.hint("SHUFFLE_HASH"),
        c("l_orderkey") === c("o_orderkey"))
      timed("SHJ join (both exchanges)")(joined)
      timed("join + perSupp agg")(joined
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(c("l_shipdate") >
          c("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L).otherwise(0L))
          .as("late_rows")))
      val q = SparkEntry.queries("rq52_tpch_q21")(spark, sf)
      timed("full query")(q)
      println(q.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .mkString("PLAN JOINS/EXCHANGES:\n", "\n", ""))
    }

    // xq80/xq81 trainer decomposition (round 18, VERDICT item 5): the r17
    // id-repartitioned cache claimed to kill 2·iters corpus exchanges but
    // the driver measured xq80 x0.88 / xq81 x0.91 COLD. The rows below put
    // stage counts and task time on all three shapes — r16 (cache as the
    // (id,bucket) aggregate leaves it; per-iteration groupBy(id) + join
    // re-exchange), r17 (id-repartitioned cache, exchange-free iterations),
    // and the r18 dense path (per-doc count vectors, 1 job/iteration, no
    // joins at all) — so the repartition question is settled by numbers.
    probe("xq80") {
      val docs = Tables.documents(spark, sf)
      val labels = docs.select(col("doc_id"),
        when(col("source") === "src0", 1L).otherwise(0L).as("y"))
      def sparseLoop(idPart: Boolean): DataFrame = {
        // inline copy of the sparse trainer with the r17 repartition made
        // optional — the r16-vs-r17 comparison the VERDICT asked for.
        val feats0 = QualityClassifier.hashedCounts(docs, "text", "doc_id", 64)
        val feats = (if (idPart) feats0.repartition(col("doc_id")) else feats0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val labs0 = labels.select(col("doc_id"), col("y").cast("long").as("y"))
        val labs = (if (idPart) labs0.repartition(col("doc_id")) else labs0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDocs = docs.count()
        var w = spark.range(64)
          .select(col("id").as("bucket"), lit(0L).as("w_u"))
        for (_ <- 1 to 3) {
          val margins = feats.join(broadcast(w), "bucket")
            .groupBy(col("doc_id"))
            .agg(sum(col("c") * col("w_u")).as("margin_u"))
            .join(labs, "doc_id")
          val errs = margins.select(col("doc_id"),
            floor((lit(1.0) / (lit(1.0) +
              exp(-(col("margin_u").cast("double") / lit(1e6)))) -
              col("y").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("e"))
          val grads = feats.join(errs, "doc_id")
            .groupBy("bucket").agg(sum(col("c") * col("e")).as("grad"))
          val updated = w.join(grads, Seq("bucket"), "left")
            .select(col("bucket"),
              (col("w_u") - floor(lit(0.1) *
                coalesce(col("grad"), lit(0L)).cast("double") /
                lit(nDocs.toDouble) + lit(0.5)).cast("long")).as("w_u"))
          w = spark.createDataFrame(
            java.util.Arrays.asList(updated.collect(): _*), updated.schema)
        }
        feats.unpersist(); labs.unpersist()
        w.select(col("bucket"), col("w_u"),
          (col("w_u").cast("double") / lit(1e6)).as("weight"))
      }
      timed("r16 shape (agg-part cache)")(sparseLoop(idPart = false))
      timed("r16 shape again")(sparseLoop(idPart = false))
      timed("r17 shape (id-part cache)")(sparseLoop(idPart = true))
      timed("r17 shape again")(sparseLoop(idPart = true))
      timed("r18 dense trainLogistic")(QualityClassifier.trainLogistic(
        docs, "text", "doc_id", labels, 64, 3, 0.1))
      timed("r18 dense again")(QualityClassifier.trainLogistic(
        docs, "text", "doc_id", labels, 64, 3, 0.1))
      timed("full xq80")(
        SparkEntry.queries("xq80_train_classifier")(spark, sf))
      timed("full xq81")(
        SparkEntry.queries("xq81_train_apply")(spark, sf))
      CacheRegistry.releaseAll(spark)
      timed("full xq80 again")(
        SparkEntry.queries("xq80_train_classifier")(spark, sf))
      timed("full xq81 again")(
        SparkEntry.queries("xq81_train_apply")(spark, sf))
    }

    // xq38/xq39 decomposition (round 18): the r17 driver bench measured a
    // 32-core-only collapse (xq38 0.79 -> 7.21 s, xq39 0.91 -> 3.51 s vs
    // 0.74/0.30 s at 8 cores, unchanged code — scaling ratios 0.10/0.09,
    // the suite's two worst). The stage rows split the narrow chunk/shingle
    // generate from each shuffle-bearing stage so the collapsing stage is
    // identified by elimination at both core counts.
    probe("xq38") {
      val docs = Tables.documents(spark, sf)
      val paras = Chunking.chunk(docs, "text", "doc_id", size = 8, overlap = 0)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      timed("paras (narrow chunk)")(paras)
      val df = paras.groupBy(col("chunk_text"))
        .agg(countDistinct(col("doc_id")).as("_nd"))
      timed("df count (chunk_text agg)")(df)
      val kept = paras.join(df, "chunk_text").where(col("_nd") < 2)
      timed("kept (join back)")(kept)
      timed("rebuilt (collect_list agg)")(kept.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("chunk_idx"),
          col("chunk_text")))), x => x.getField("chunk_text")), " ")
          .as("clean_text")))
      (1 to 6).foreach { i =>
        timed(s"full query run $i")(
          SparkEntry.queries("xq38_paragraph_dedup")(spark, sf))
      }
    }

    probe("xq39") {
      val docs = Tables.documents(spark, sf)
      val train = docs.where(col("source") =!= "src0")
      val eval = docs.where(col("source") === "src0")
      val evalGrams = Shingles.hashed(eval, "text", "doc_id", 4)
        .select("shingle").distinct()
      timed("eval grams distinct")(evalGrams)
      val hits = Shingles.hashedWithPos(train, "text", "doc_id", 4)
        .join(broadcast(evalGrams), "shingle")
        .select(col("doc_id"), col("pos"))
      timed("hits (gen + bcast join)")(hits)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      timed("spans (window + agg)")(hits
        .withColumn("_grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("_grp"))
        .agg(min(col("pos")).as("span_start"), count(lit(1)).as("span_grams")))
      timed("full query (with sort)")(
        SparkEntry.queries("xq39_contamination_spans")(spark, sf))
      timed("full again (steady state)")(
        SparkEntry.queries("xq39_contamination_spans")(spark, sf))
    }

    // xq60 pagerank loop-shape A/B (round 18): repeated in-JVM steady-state
    // runs — the only measurement this box's tenant noise respects.
    probe("xq60") {
      (1 to 6).foreach { i =>
        timed(s"full xq60 run $i")(
          SparkEntry.queries("xq60_pagerank")(spark, sf))
        CacheRegistry.releaseAll(spark)
      }
    }

    // dedupGroups family decomposition (round 18): xq32/xq63/xq67/xq74/xq85
    // all sit on minhashCandidatePairs + connectedComponents (1.2-1.4 s
    // each at 32c). The rows separate signature/banding, the candidate
    // self-join, the CC loop (with round count), and the final attach, so
    // the loop's per-round job overhead is visible against the pair work.
    probe("xq32") {
      val docs = Tables.documents(spark, sf)
      timed("band table (sig+explode)")(
        Dedup.bandTable(docs, "text", "doc_id"))
      val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      timed("candidate pairs (join+distinct)")(pairs)
      var rounds = 0
      val t0 = System.nanoTime()
      val labels = Dedup.connectedComponents(pairs, 64, None,
        (i, _) => rounds = i)
      noop(labels)
      println(f"STAGE  cc loop ($rounds rounds)                 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      timed("full xq32 (groups+attach)")(
        SparkEntry.queries("xq32_dedup_groups")(spark, sf))
      CacheRegistry.releaseAll(spark)
      timed("full xq67 (soft weights)")(
        SparkEntry.queries("xq67_soft_dedup_weights")(spark, sf))
    }

    probe("pq16") {
      // the sf10 RESIDUAL adjudication (r15 verdict #2): where do the
      // 1.7 s go — the filtered scan, the user-keyed exchange + agg, or
      // the 2-row presentation tail?
      import org.apache.spark.sql.functions.{col => c}
      val ev = Tables.events(spark, sf)
        .where(c("event_type").isin("signup", "purchase"))
        .select(c("user_id"), c("event_type"),
          unix_timestamp(c("ts")).as("ts_sec"))
      timed("filtered 3-col scan")(ev)
      val perUser = ev.groupBy("user_id")
        .agg(min(when(c("event_type") === "signup", c("ts_sec")))
          .as("signup_ts"),
          max(when(c("event_type") === "purchase", c("ts_sec")))
            .as("last_purchase_ts"))
        .where(c("signup_ts").isNotNull)
      timed("scan + per-user agg (exchange)")(perUser)
      timed("+ global funnel agg")(perUser
        .agg(count(lit(1)).as("signed_up"),
          coalesce(sum(when(c("last_purchase_ts") > c("signup_ts"), 1L)
            .otherwise(0L)), lit(0L)).as("converted")))
      timed("full query")(SparkEntry.queries("pq16_funnel")(spark, sf))
    }

    spark.stop()
  }
}
