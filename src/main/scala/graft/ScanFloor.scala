package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Committed floor rows for the >2x-at-scale adjudications (round 15).
  *
  * For every query whose sfN ratio exceeds 2x, BASELINE.md's standing
  * adjudication claims the residual is Spark's per-job / per-scan floor,
  * not a plan defect. This main makes that claim REGENERABLE: it times
  * (min of 3 noop writes, same harness as Bench) the bare column-pruned
  * scans each flagged query cannot avoid reading, the one canonical
  * exchange the shuffle-bound rows cannot avoid paying, and the empty-job
  * dispatch floor the iterative/tiny-input rows pay per job — and writes
  * them to a JSON file that is committed per SF
  * (`tools/scan_floor_<sf>.json`). `tools/floor_adjudicate.py` reads
  * these next to the committed min files and prints each flagged row as
  * `query >= floor + epsilon` with the floor/duck ratio that decides
  * "structurally floor-bound at this SF" vs "plan work remains".
  *
  * Usage: runMain graft.ScanFloor <sfDir> <outJson>
  *        runMain graft.ScanFloor <sfDir> <outJson> extra <q1,q2,...>
  * `extra` mode measures ONLY the rows added after an artifact was
  * produced (new floor rows + job counts for EXACTLY the named queries)
  * and MERGES them into the existing artifact — a full re-run of an sf10
  * artifact costs ~25 min of xq47 alone, the extras cost seconds. The
  * query list is REQUIRED (r16 ADVICE): the caller must state which jobs
  * rows are stale after a plan change; carried rows stay verbatim, and
  * the merge refuses an artifact whose sf/cpus differ from this run.
  */
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/scan_floor.json"
    val extraOnly = args.length > 2 && args(2) == "extra"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, "scan-floor")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf3(df: => DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }.min

    val li = () => Tables.lineitem(spark, sf)
    val floors = scala.collection.mutable.LinkedHashMap[String, Double]()
    def row(name: String)(df: => DataFrame): Unit = {
      floors(name) = BigDecimal(minOf3(df))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      println(f"FLOOR  $name%-28s ${floors(name)}%7.3f s")
    }

    // warm the session (JIT, codegen, filesystem metadata) before any row
    noop(li().select("l_orderkey"))

    if (!extraOnly) {
    // empty-job dispatch: the per-job cost every query pays per action —
    // iterative queries (kmeans' 2 rounds, CC's log rounds) pay it per
    // round regardless of input size
    row("job_floor")(spark.range(1000).toDF("i"))
    // fact-scan floors, column-pruned exactly as the flagged queries read
    row("lineitem_q8_5col")(li().select("l_partkey", "l_orderkey",
      "l_suppkey", "l_extendedprice", "l_discount"))
    row("lineitem_q9_6col")(li().select("l_partkey", "l_suppkey",
      "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"))
    row("lineitem_q20_4col")(li().select("l_partkey", "l_suppkey",
      "l_shipdate", "l_quantity"))
    row("lineitem_q21_3col")(li().select("l_orderkey", "l_suppkey",
      "l_shipdate"))
    row("lineitem_xq109_3col")(li().select("l_partkey", "l_quantity",
      "l_extendedprice"))
    // the canonical exchange the Q21 shape cannot avoid: hash-repartition
    // the 3 needed columns by orderkey (scan + full shuffle, no compute)
    row("lineitem_q21_exchange")(li().select("l_orderkey", "l_suppkey",
      "l_shipdate").repartition(col("l_orderkey")))
    row("orders_scan_2col")(Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate"))
    row("orders_scan_3col")(Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_custkey"))
    row("part_scan_1col")(Tables.part(spark, sf).select("p_partkey"))
    // event/embedding/document scans for the floor-band stragglers
    row("events_scan_3col")(Tables.events(spark, sf)
      .select("user_id", "ts", "value"))
    row("embeddings_scan")(Tables.embeddings(spark, sf)
      .select("vec_id", "embedding"))
    row("documents_text_scan")(Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len")))
    // Per-read-set events floors (round 16): the pq-family rows read
    // DIFFERENT column sets — a floor must lower-bound the query's own
    // unavoidable read, so a shared 3-col row both over- and under-states
    // (event_type's string decode is the expensive column; `value` is a
    // cheap double). Inside the full-run guard since r17: every artifact
    // now carries them, and an extra-mode side-effect re-measure was
    // observed REPLACING committed values 2.6x higher (contradicting the
    // carried-verbatim contract and inflating floor adjudications).
    row("events_uet_scan")(Tables.events(spark, sf)
      .select("user_id", "event_type", "ts"))       // pq16
    row("events_et_scan")(Tables.events(spark, sf)
      .select("event_type", "ts"))                  // pq01, pq15
    row("events_ut_scan")(Tables.events(spark, sf)
      .select("user_id", "ts"))                     // pq17
    } // !extraOnly

    // Job counts for the floor-band stragglers: pq13/xq84/xq47 are
    // multi-job plans over tiny (gate-SF) inputs, so their absolute time
    // is n_jobs x job dispatch + scans, not compute. Counting jobs in the
    // artifact lets floor_adjudicate.py state that composition from
    // committed numbers instead of a prose claim.
    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Int]()
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // extra mode counts EXACTLY the queries the caller names (a plan
    // change staled their counts; nothing else is touched); a full run
    // covers the whole flagged set
    val jobQueries =
      if (extraOnly) {
        require(args.length > 3 && args(3).nonEmpty,
          "extra mode requires the re-measured query list as arg 4 " +
            "(comma-separated; pass the queries whose plans changed)")
        val names = args(3).split(",").toSeq
        // validate BEFORE any measurement: a typo'd name would otherwise
        // surface as None.get after minutes of floor timing, artifact
        // unwritten (r17 review)
        val known = SparkEntry.allDefs.map(_.name).toSet
        val bad = names.filterNot(known.contains)
        require(bad.isEmpty,
          s"unknown query name(s) in extra list: ${bad.mkString(", ")}")
        names
      }
      else Seq("pq13_sessionize", "xq84_cluster_sample", "xq47_semdedup",
        "xq109_bloom_join", "rq49_tpch_q8", "rq50_tpch_q9",
        "rq51_tpch_q20", "rq52_tpch_q21", "pq01_daily_type_counts",
        "pq14_latest_per_user",
        "pq15_sliding_window", "pq16_funnel", "pq17_cohort_retention",
        "xq14_ann_ivf", "xq96_ann_serve", "xq27_lsh_multiprobe")
    for (q <- jobQueries) {
      val qd = SparkEntry.allDefs.find(_.name == q).get
      queries.QueryDef.applyConfs(spark, qd.confs)
      noop(qd.run(spark, sf)) // warm (plans/codegen)
      // deterministic barrier, not a wall-clock sleep: a slow async bus
      // would otherwise leak warm-run job starts into the measured count
      // or drop late ones (r15 ADVICE)
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      counter.set(0)
      noop(qd.run(spark, sf))
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      jobCounts(q) = counter.get()
      queries.QueryDef.applyConfs(spark, Nil)
      println(f"JOBS   $q%-28s ${jobCounts(q)}%4d jobs")
    }
    operators.CacheRegistry.releaseAll(spark)

    // extra mode: prior artifact rows carry, freshly measured keys override
    val (outFloors, outJobs) =
      if (extraOnly) {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out)), "UTF-8")
        // This main is the artifact's only writer, so the grammar is
        // closed: flat string/number scalars and one-level {..} objects
        // of number-valued keys. Parse it TOTALLY within that grammar —
        // keys via quoted-token scan, values from the LAST ':' (a key
        // containing ':' round-trips) — and refuse anything that doesn't
        // parse instead of silently corrupting the merge (r16 ADVICE).
        def scalar(name: String): String =
          (s""""$name"\\s*:\\s*"?([^",}]+)"?""").r.findFirstMatchIn(text)
            .map(_.group(1).trim)
            .getOrElse(sys.error(s"artifact $out: missing scalar '$name'"))
        // a stale artifact from another SF/host must never be relabeled
        // as this run's (the merge keeps old rows verbatim)
        require(scalar("sf") == sf,
          s"artifact $out was measured at sf='${scalar("sf")}', this run " +
            s"is '$sf' — refusing to merge across scale factors")
        require(scalar("cpus") == cpus,
          s"artifact $out was measured with cpus=${scalar("cpus")}, this " +
            s"run uses $cpus — refusing to merge across parallelism")
        def block(name: String): Seq[(String, String)] = {
          val start = text.indexOf(s""""$name":{""")
          require(start >= 0, s"artifact $out: missing block '$name'")
          val open = start + name.length + 4
          val close = text.indexOf('}', open)
          require(close >= 0, s"artifact $out: unterminated block '$name'")
          val body = text.substring(open, close).trim
          if (body.isEmpty) Seq.empty
          else body.split(",").toSeq.map { kv =>
            val cut = kv.lastIndexOf(':')
            require(cut > 0, s"artifact $out: unparseable entry '$kv' in '$name'")
            val k = kv.substring(0, cut).trim.stripPrefix("\"").stripSuffix("\"")
            val v = kv.substring(cut + 1).trim
            require(k.nonEmpty && v.nonEmpty &&
              v.forall(c => c.isDigit || c == '.' || c == '-' || c == 'E' || c == 'e'),
              s"artifact $out: non-numeric entry '$kv' in '$name'")
            (k, v)
          }
        }
        (block("floors").filterNot(kv => floors.contains(kv._1)) ++
           floors.map { case (k, v) => (k, v.toString) },
         block("jobs").filterNot(kv => jobCounts.contains(kv._1)) ++
           jobCounts.map { case (k, v) => (k, v.toString) })
      } else (floors.toSeq.map { case (k, v) => (k, v.toString) },
        jobCounts.toSeq.map { case (k, v) => (k, v.toString) })

    val json = outFloors.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"sf":"$sf","cpus":$cpus,"floors":{""", ",", "},") +
      outJobs.map { case (k, v) => s""""$k":$v""" }
        .mkString(""""jobs":{""", ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
