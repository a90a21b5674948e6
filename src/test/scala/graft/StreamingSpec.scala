package graft

import graft.operators.CounterDerivation
import graft.streaming.{CounterPipeline, CounterStore, Recentchange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** End-to-end streaming specs: fixture events (shaped like the reference's
  * SSE corpus, FIXTURES.md §2) replayed through MemoryStream → parse →
  * fan-out → daily windows → foreachBatch merge → CounterStore queries.
  * Covers late/out-of-order arrival and cross-batch idempotent updates.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def event(id: Long, tsSec: Long, wiki: String, typ: String,
      bot: Boolean = false, minor: Boolean = false,
      len: Option[(Long, Long)] = None): (String, String) = {
    val lenJson = len.map { case (o, n) => s""","length":{"old":$o,"new":$n}""" }.getOrElse("")
    val key = s"""[{"topic":"x","partition":0,"timestamp":${tsSec * 1000}}]"""
    val value = s"""{"id":$id,"wiki":"$wiki","type":"$typ","bot":$bot,"minor":$minor,
      |"timestamp":$tsSec,"meta":{"id":"u-$id","dt":"x","stream":"rc"}$lenJson}"""
      .stripMargin.replace("\n", "")
    (key, value)
  }

  private val day0 = 18489L // 2020-08-15
  private def t(day: Long, h: Int) = day * 86400 + h * 3600

  test("streaming pipeline: replay, late data, idempotent merge, store queries") {
    val tableDir = Files.createTempDirectory("graft-agg").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val messages = stream.toDF().toDF("key", "value")

    val q = CounterPipeline.start(spark, messages, tableDir, ckpt,
      watermark = "48 hours", trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: two events on day0, one on day0+1
      stream.addData(
        event(1, t(day0, 1), "enwiki", "edit", bot = true, len = Some((10L, 20L))),
        event(2, t(day0, 2), "dewiki", "edit", minor = true, len = Some((30L, 25L))),
        event(3, t(day0 + 1, 0), "enwiki", "new"))
      q.processAllAvailable()

      val store = new CounterStore(spark, tableDir)
      val d0 = store.countersForDay(day0).as[(String, Long)].collect().toMap
      assert(d0("total") == 2L)
      assert(d0("wiki_enwiki") == 1L && d0("wiki_dewiki") == 1L)
      assert(d0("bot") == 1L && d0("minor") == 1L)
      assert(d0("length_inc") == 1L && d0("length_dec") == 1L)

      // batch 2: a LATE event for day0 (arrives after day0+1 data) must
      // still land in day0's bucket — the reference accepts late data.
      stream.addData(event(4, t(day0, 23), "enwiki", "edit"))
      q.processAllAvailable()

      val d0b = store.countersForDay(day0).as[(String, Long)].collect().toMap
      assert(d0b("total") == 3L, "late event must update day0 total")
      assert(d0b("wiki_enwiki") == 2L)
      // day0+1 partition untouched by the merge of day0 keys
      val d1 = store.countersForDay(day0 + 1).as[(String, Long)].collect().toMap
      assert(d1("total") == 1L && d1("type_new") == 1L)

      // growth = sum of lendiffs: (20-10) + (25-30) = 5 on day0
      val growth = store.table.where(col("day") === day0 && col("counter") === "total")
        .select("growth").head().getLong(0)
      assert(growth == 5L)

      // store queries: availableDays (desc, with date string), top-k, enrich
      val days = store.availableDays(minDay = 0L).as[(Long, String, Long)].collect()
      assert(days.map(_._1).toSeq == Seq(day0 + 1, day0))
      assert(days.last._2 == "2020-08-15")

      val top = store.topKByPrefix(day0, "wiki_", suffix = "wiki")
        .as[(String, Long)].collect()
      assert(top.head == (("wiki_enwiki", 2L)))

      // wiki_enwiki -> code "en" -> "English"
      val langs = new CounterStore(spark, tableDir)
        .enrichLanguages(store.topKByPrefix(day0, "wiki_"))
        .select("name", "language").as[(String, String)].collect().toMap
      assert(langs("wiki_enwiki") == "English" && langs("wiki_dewiki") == "German")
    } finally q.stop()
  }

  test("exactly-once under partial failure: crash between partition writes, retry, no double-count") {
    // foreachBatch gives at-least-once batch EXECUTION; the exactly-once
    // EFFECT rests on mergeBatch's replace-by-key being idempotent even
    // when a crash leaves the store PARTIALLY updated (dynamic partition
    // overwrite commits day directories one by one). Simulate the crash
    // point exactly: apply the batch to day0 only (as if the process died
    // before day1's directory swap), then replay the FULL batch — the
    // retried merge must converge to the clean single-run store, with
    // nothing counted twice on the already-written day0.
    val batch = Seq(
      (day0, "total", 5L, 7L), (day0, "wiki_enwiki", 5L, 7L),
      (day0 + 1, "total", 2L, 0L), (day0 + 1, "type_new", 2L, 0L)
    ).toDF("day", "counter", "n", "growth")
    val prior = Seq( // pre-existing store state from earlier batches
      (day0, "total", 3L, 2L), (day0, "bot", 1L, 0L),
      (day0 + 1, "total", 1L, 0L)
    ).toDF("day", "counter", "n", "growth")

    def freshStore(): String = {
      val dir = Files.createTempDirectory("graft-crash").toString
      CounterPipeline.mergeBatch(spark, dir)(prior, 0L)
      dir
    }
    def snapshot(dir: String): Map[(Long, String), (Long, Long)] =
      graft.streaming.CounterTable.read(spark, dir)
        .select("day", "counter", "n", "growth")
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

    // clean run: the whole batch applies once
    val clean = freshStore()
    CounterPipeline.mergeBatch(spark, clean)(batch, 1L)

    // crashed run: only day0's partition got swapped before the "kill"
    val crashed = freshStore()
    CounterPipeline.mergeBatch(spark, crashed)(batch.where(col("day") === day0), 1L)
    assert(snapshot(crashed)((day0, "total")) == ((5L, 7L)) &&
      snapshot(crashed)((day0 + 1, "total")) == ((1L, 0L)),
      "precondition: store must be half-updated after the injected crash")
    // restart replays the SAME batch in full
    CounterPipeline.mergeBatch(spark, crashed)(batch, 1L)
    assert(snapshot(crashed) == snapshot(clean),
      "retried merge must converge to the clean-run store")
    // and a further redundant replay stays a fixpoint (no double counts)
    CounterPipeline.mergeBatch(spark, crashed)(batch, 1L)
    assert(snapshot(crashed) == snapshot(clean))
    // untouched keys of rewritten partitions survive the merge
    assert(snapshot(crashed)((day0, "bot")) == ((1L, 0L)))
  }

  test("torn-write window: kill between partition rewrite and checkpoint commit, engine replay converges") {
    // The remaining exactly-once edge (round-9 brief): foreachBatch runs
    // mergeBatch BEFORE the engine writes commits/<N>, so a kill in that
    // window leaves the store ALREADY REWRITTEN while the checkpoint says
    // batch N never ran. On restart the engine itself replays batch N —
    // same offsets from offsets/<N>, state store rolled back, hence the
    // same update-mode totals — against the already-merged store. The
    // earlier partial-failure test drives mergeBatch by hand; this one
    // drives the REAL restart machinery: run a file-drop stream to
    // completion, then rewind the checkpoint to byte-for-byte the on-disk
    // state of a kill inside batch N's torn window (offsets/<N> and the
    // source's batch-N file map present — both are written at planning
    // time — commits/<N> and everything later absent) for N = the
    // data-carrying merge batch of the second feed, and restart. The
    // engine must replay that merge and converge to the batch twin.
    val dropDir = Files.createTempDirectory("graft-torn-drop").toString
    val ckpt = Files.createTempDirectory("graft-torn-ckpt").toString
    val tableDir = Files.createTempDirectory("graft-torn-store").toString
    val batch1 = (1 to 40).map(i =>
      event(i.toLong, t(day0, 0) + i * 997, s"w${i % 3}wiki",
        if (i % 3 == 0) "edit" else "new",
        len = if (i % 2 == 0) Some((i.toLong, 2L * i)) else None))
    // second feed touches BOTH days so the replayed merge spans partitions
    val batch2 = (41 to 80).map(i =>
      event(i.toLong, t(day0 + (i % 2), i % 22) + i * 131, s"w${i % 3}wiki",
        if (i % 4 == 0) "categorize" else "edit",
        bot = i % 5 == 0,
        len = if (i % 3 == 0) Some((2L * i, i.toLong)) else None))
    def run(): Unit = {
      // a stopped query deregisters its checkpoint asynchronously; the
      // restart must wait out the concurrent-checkpoint guard
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val q = CounterPipeline.start(spark,
        CounterPipeline.fromFileDrop(spark, dropDir), tableDir, ckpt,
        trigger = Trigger.ProcessingTime(0))
      try q.processAllAvailable() finally q.stop()
    }
    def commitFiles(): Seq[java.io.File] =
      new java.io.File(ckpt, "commits").listFiles().toSeq
        .filter(_.getName.forall(_.isDigit))
    def snap(): Set[(Long, String, Long, Long)] =
      graft.streaming.CounterTable.read(spark, tableDir)
        .select("day", "counter", "n", "growth")
        .as[(Long, String, Long, Long)].collect().toSet

    graft.sources.EventFiles.writeBatch(batch1.toDF("key", "value"), dropDir)
    run()
    val committedAfterRun1 = commitFiles().map(_.getName.toLong).max
    graft.sources.EventFiles.writeBatch(batch2.toDF("key", "value"), dropDir)
    run()
    val twin = CounterDerivation.forRecentchange(
      Recentchange.parse((batch1 ++ batch2).toDF("key", "value")))
      .groupBy("day", "counter")
      .agg(count(lit(1)).as("n"), sum("lendiff").as("growth"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(snap() == twin, "precondition: clean two-feed run equals batch twin")

    // the tear: N = the first batch of the second feed (it carries all 40
    // new files — the file source is unthrottled here). The store keeps
    // every merged partition; the checkpoint is rewound to mid-batch-N:
    // keep offsets/<N> and sources/0/<N>, drop commits/<N> and every later
    // metadata entry (a crash can never have written those — commits/<N>
    // precedes offsets/<N+1>). Checksum twins go with their files, as
    // ChecksumFileSystem would otherwise refuse the replayed commit.
    val n = committedAfterRun1 + 1
    assert(commitFiles().exists(_.getName.toLong == n),
      "second run must have committed the merge batch")
    def rewind(rel: String, keepUpTo: Long): Unit = {
      val dir = new java.io.File(ckpt, rel)
      if (dir.isDirectory) dir.listFiles().foreach { f =>
        val id = f.getName.stripPrefix(".").stripSuffix(".crc")
        if (id.nonEmpty && id.forall(_.isDigit) && id.toLong > keepUpTo)
          assert(f.delete(), s"could not tear $f")
      }
    }
    rewind("commits", n - 1)
    rewind("offsets", n)
    rewind("sources/0", n)

    run() // restart: the engine replays merge batch N itself
    assert(snap() == twin,
      "engine-replayed merge must converge to the batch-twin counters")
    assert(commitFiles().exists(_.getName.toLong == n),
      "replay must re-commit the torn batch")
  }

  test("restart under load: torn day-spanning merge replays ahead of queued files, three-partition convergence") {
    // The torn-write case above restarts into a QUIET source; a production
    // restart lands in a backlog — the crash happened mid-ingest, so when
    // the engine comes back, torn batch N must replay against the
    // already-merged store AND the files that arrived while it was down
    // queue up right behind it in the very next batch, with counter keys
    // overlapping the replayed ones. Three day partitions are touched, the
    // middle one TWICE in one restart (once by the replayed merge, once by
    // the catch-up merge) — pinning mergeBatch's replace-by-key semantics
    // and changed-day pruning through a replay-then-advance sequence, not
    // just a single replayed batch.
    val dropDir = Files.createTempDirectory("graft-load-drop").toString
    val ckpt = Files.createTempDirectory("graft-load-ckpt").toString
    val tableDir = Files.createTempDirectory("graft-load-store").toString
    val feed1 = (1 to 40).map(i =>
      event(i.toLong, t(day0, 0) + i * 997, s"w${i % 3}wiki",
        if (i % 3 == 0) "edit" else "new",
        len = if (i % 2 == 0) Some((i.toLong, 2L * i)) else None))
    // the torn feed spans day0 / day0+1
    val feed2 = (41 to 80).map(i =>
      event(i.toLong, t(day0 + (i % 2), i % 22) + i * 131, s"w${i % 3}wiki",
        if (i % 4 == 0) "categorize" else "edit",
        bot = i % 5 == 0,
        len = if (i % 3 == 0) Some((2L * i, i.toLong)) else None))
    // the backlog feed spans day0+1 / day0+2 with the SAME wiki/type keys,
    // so its merge rewrites a partition the replayed batch just rewrote
    val feed3 = (81 to 120).map(i =>
      event(i.toLong, t(day0 + 1 + (i % 2), i % 20) + i * 113, s"w${i % 3}wiki",
        if (i % 4 == 0) "categorize" else "edit",
        minor = i % 7 == 0,
        len = if (i % 3 == 0) Some((i.toLong, 3L * i)) else None))
    def run(): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val q = CounterPipeline.start(spark,
        CounterPipeline.fromFileDrop(spark, dropDir), tableDir, ckpt,
        trigger = Trigger.ProcessingTime(0))
      try q.processAllAvailable() finally q.stop()
    }
    def commitFiles(): Seq[java.io.File] =
      new java.io.File(ckpt, "commits").listFiles().toSeq
        .filter(_.getName.forall(_.isDigit))
    def snap(): Set[(Long, String, Long, Long)] =
      graft.streaming.CounterTable.read(spark, tableDir)
        .select("day", "counter", "n", "growth")
        .as[(Long, String, Long, Long)].collect().toSet

    graft.sources.EventFiles.writeBatch(feed1.toDF("key", "value"), dropDir)
    run()
    val committedAfterRun1 = commitFiles().map(_.getName.toLong).max
    graft.sources.EventFiles.writeBatch(feed2.toDF("key", "value"), dropDir)
    run()

    // tear the checkpoint to mid-batch-N exactly as the quiet-restart case
    val n = committedAfterRun1 + 1
    assert(commitFiles().exists(_.getName.toLong == n),
      "second run must have committed the merge batch")
    def rewind(rel: String, keepUpTo: Long): Unit = {
      val dir = new java.io.File(ckpt, rel)
      if (dir.isDirectory) dir.listFiles().foreach { f =>
        val id = f.getName.stripPrefix(".").stripSuffix(".crc")
        if (id.nonEmpty && id.forall(_.isDigit) && id.toLong > keepUpTo)
          assert(f.delete(), s"could not tear $f")
      }
    }
    rewind("commits", n - 1)
    rewind("offsets", n)
    rewind("sources/0", n)
    // ... and the backlog lands while the engine is down: batch N's file
    // map (sources/0/<N>) is already fixed, so these files MUST ride the
    // first post-replay batch, not contaminate the replay.
    graft.sources.EventFiles.writeBatch(feed3.toDF("key", "value"), dropDir)

    run() // one restart: replay batch N, then drain the backlog
    val twin = CounterDerivation.forRecentchange(
      Recentchange.parse((feed1 ++ feed2 ++ feed3).toDF("key", "value")))
      .groupBy("day", "counter")
      .agg(count(lit(1)).as("n"), sum("lendiff").as("growth"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(snap() == twin,
      "replay + backlog drain must converge to the three-feed batch twin")
    assert(commitFiles().map(_.getName.toLong).max > n,
      "the backlog must have committed in a batch after the replayed one")
    assert(snap().map(_._1) == Set(day0, day0 + 1, day0 + 2),
      "three day partitions expected")
  }

  test("merge prunes unchanged days and clusters one file per day partition") {
    val dir = Files.createTempDirectory("graft-merge-shape").toString
    val batch = (0 until 30).flatMap(d => Seq(
      (day0 + d, "total", 10L + d, 1L), (day0 + d, "bot", 2L, 0L)
    )).toDF("day", "counter", "n", "growth")
    CounterPipeline.mergeBatch(spark, dir)(batch, 0L)

    // Walk the LIVE generation: merges commit immutable gen-<n> dirs and
    // swap a pointer (CounterTable), so layout assertions are about the
    // generation a reader resolves, relativized so unchanged hard-linked
    // files keep identical names across generations.
    def files(): Set[String] = {
      val gen = graft.streaming.CounterTable.currentGen(dir).get
      val root = java.nio.file.Paths.get(dir, gen)
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(root.relativize(_).toString).toSet
    }
    val after0 = files()
    // day-clustered write: every day=<d> partition holds exactly ONE file —
    // without the cluster, 30 days × shuffle tasks of fragments compound
    // into every later batch's store read (the r6 unordered-soak pathology)
    val byDay = after0.groupBy(_.split("/")(0))
    assert(byDay.size == 30 && byDay.values.forall(_.size == 1),
      s"expected one file per day partition, got ${byDay.view.mapValues(_.size).toMap}")

    // replaying an IDENTICAL batch must rewrite nothing (changed-day prune)
    CounterPipeline.mergeBatch(spark, dir)(batch, 0L)
    assert(files() == after0, "identical replay must not rewrite any partition")

    // a batch changing ONE day rewrites only that partition's file
    val oneDay = Seq((day0 + 3, "total", 99L, 9L)).toDF("day", "counter", "n", "growth")
    CounterPipeline.mergeBatch(spark, dir)(oneDay, 1L)
    val after1 = files()
    assert((after0 -- after1).forall(_.startsWith(s"day=${day0 + 3}/")) &&
      (after1 -- after0).forall(_.startsWith(s"day=${day0 + 3}/")),
      "single-day change must rewrite only that day's partition")
    // and the untouched key of the rewritten day survives
    val row = graft.streaming.CounterTable.read(spark, dir)
      .where(col("day") === (day0 + 3) && col("counter") === "bot")
      .select("n").as[Long].collect()
    assert(row.toSeq == Seq(2L))
  }

  test("streaming aggregation agrees with the batch twin") {
    val tableDir = Files.createTempDirectory("graft-agg2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]

    val events = (1 to 200).map { i =>
      event(i.toLong, t(day0, 0) + i * 557, s"w${i % 5}wiki", if (i % 3 == 0) "edit" else "new",
        bot = i % 7 == 0, len = if (i % 2 == 0) Some((i.toLong, (i * 2).toLong)) else None)
    }
    val q = CounterPipeline.start(spark, stream.toDF().toDF("key", "value"),
      tableDir, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      events.grouped(67).foreach { g => stream.addData(g: _*); q.processAllAvailable() }

      val streamed = graft.streaming.CounterTable.read(spark, tableDir)
        .select("day", "counter", "n", "growth")
        .as[(Long, String, Long, Long)].collect().toSet

      val batch = CounterDerivation.forRecentchange(
        Recentchange.parse(events.toDF("key", "value")))
        .groupBy("day", "counter")
        .agg(count(lit(1)).as("n"), sum("lendiff").as("growth"))
        .as[(Long, String, Long, Long)].collect().toSet

      assert(streamed == batch)
    } finally q.stop()
  }

  test("duplicate event delivery is counted once (dropDuplicatesWithinWatermark)") {
    val tableDir = Files.createTempDirectory("graft-agg3").toString
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = CounterPipeline.start(spark, stream.toDF().toDF("key", "value"),
      tableDir, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      val e1 = event(1, t(day0, 1), "enwiki", "edit")
      stream.addData(e1, event(2, t(day0, 2), "dewiki", "edit"))
      q.processAllAvailable()
      // redelivery of event 1 (same key) in a later batch
      stream.addData(e1)
      q.processAllAvailable()
      val store = new CounterStore(spark, tableDir)
      val d0 = store.countersForDay(day0).as[(String, Long)].collect().toMap
      assert(d0("total") == 2L, s"redelivered event must not double-count: $d0")
      // the event-id dedup state is the one unbounded-cardinality state in
      // the system — assert it actually runs on the RocksDB provider
      // (Sessions config), not the heap-resident HDFS default
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      val metrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray(Array.empty[String]))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"state operator metrics show no rocksdb provider: ${metrics.mkString(",")}")
    } finally q.stop()
  }

  test("dedup state evicts after the watermark passes (bounded-state contract)") {
    // r16 brief item 7: the batch dedup family is complete; this is the
    // STREAMING personality's within-watermark dedup exhibit. Cross-batch
    // redelivery inside the watermark is dropped (state holds the id);
    // once event time moves past the watermark, the dedup rows EVICT —
    // state is bounded by events-per-watermark-window, never by stream
    // lifetime (SCALING.md §streaming-dedup has the sizing arithmetic).
    val tableDir = Files.createTempDirectory("graft-dedup-evict").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-evict").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = CounterPipeline.start(spark, stream.toDF().toDF("key", "value"),
      tableDir, ckpt, watermark = "1 hour", trigger = Trigger.ProcessingTime(0))
    try {
      def dedupState = q.lastProgress.stateOperators
        .find(_.operatorName.toLowerCase.contains("dedup")).get
      val e1 = event(1, t(day0, 1), "enwiki", "edit")
      stream.addData(e1, event(2, t(day0, 2), "dewiki", "edit"))
      q.processAllAvailable()
      assert(dedupState.numRowsTotal == 2L)
      // cross-micro-batch redelivery INSIDE the watermark: dropped
      stream.addData(e1)
      q.processAllAvailable()
      val store = new CounterStore(spark, tableDir)
      assert(store.countersForDay(day0).as[(String, Long)].collect()
        .toMap.apply("total") == 2L, "in-watermark redelivery must not count")
      // events two days later advance the watermark far past day0; the
      // eviction happens in the batch that RUNS with the advanced
      // watermark, hence two feeds
      stream.addData(event(3, t(day0 + 2, 1), "enwiki", "edit"))
      q.processAllAvailable()
      stream.addData(event(4, t(day0 + 2, 2), "enwiki", "edit"))
      q.processAllAvailable()
      assert(dedupState.numRowsTotal <= 2L,
        s"day0 dedup rows must evict after the watermark, " +
          s"state=${dedupState.numRowsTotal}")
      assert(store.countersForDay(day0 + 2).as[(String, Long)].collect()
        .toMap.apply("total") == 2L)
    } finally q.stop()
  }

  test("rate limit: backlog drains in bounded micro-batches, same totals") {
    // The reference backpressures through unbuffered channels; our twin is
    // per-trigger input bounding. 6 pre-existing .dat files + a limit of 2
    // must drain as >= 3 bounded batches (never one giant catch-up batch)
    // while delivering every event exactly once.
    val dropDir = Files.createTempDirectory("graft-drop").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-rl").toString
    val events = (1 to 6).map(i =>
      event(i.toLong, t(day0, i), "enwiki", "edit"))
    graft.sources.EventFiles.writeBatch(
      events.toDF("key", "value"), dropDir)
    val batches = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val messages = CounterPipeline.fromFileDrop(spark, dropDir,
      maxFilesPerTrigger = 2)
    val q = messages.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("key").collect().map(_.getString(0)).toSeq
        ()
      }
      .start()
    q.awaitTermination()
    val sizes = batches.map(_.size)
    assert(batches.size >= 3, s"expected bounded batches, got sizes $sizes")
    assert(sizes.forall(_ <= 2), s"a batch exceeded the limit: $sizes")
    assert(batches.flatten.size == 6 && batches.flatten.distinct.size == 6,
      "every event delivered exactly once across the drained batches")
  }

  test("complete-mode leaderboard: sorted top-k maintained across batches") {
    // The dashboard's live top-k as a CONTINUOUS query: complete output
    // mode is the one mode that permits sorting+limit in streaming; each
    // trigger re-emits the whole (tiny: k rows) leaderboard.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val counts = CounterDerivation.explodeRecentchange(
      Recentchange.parse(stream.toDF().toDF("key", "value")))
      .groupBy("counter").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("counter")).limit(3)
    val q = counts.writeStream
      .outputMode("complete")
      .format("memory").queryName("leaderboard")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      stream.addData(
        event(1, t(day0, 1), "enwiki", "edit"),
        event(2, t(day0, 2), "enwiki", "edit"),
        event(3, t(day0, 3), "dewiki", "new"))
      q.processAllAvailable()
      val round1 = spark.table("leaderboard")
        .as[(String, Long)].collect().toSeq
      assert(round1.head == (("total", 3L)))
      assert(round1.map(_._1).take(3) == Seq("total", "type_edit", "wiki_enwiki"))
      // A later batch reorders the board: dewiki overtakes enwiki.
      stream.addData(
        event(4, t(day0, 4), "dewiki", "new"),
        event(5, t(day0, 5), "dewiki", "new"),
        event(6, t(day0, 6), "dewiki", "new"))
      q.processAllAvailable()
      val round2 = spark.table("leaderboard")
        .as[(String, Long)].collect().toSeq
      assert(round2.head == (("total", 6L)))
      assert(round2.contains(("type_new", 4L)), s"got $round2")
    } finally q.stop()
  }

  test("permissive parse: corrupt events still count toward total") {
    val raw = Seq(
      ("""[{"timestamp":1597491600000}]""", """{"wiki":"enwiki","type":"edit","timestamp":1597491600}"""),
      ("""[{"timestamp":1597491600000}]""", """not json at all""")
    ).toDF("key", "value")
    val parsed = Recentchange.parse(raw)
    assert(parsed.count() == 2)
    val counters = CounterDerivation.forRecentchange(parsed)
      .where(col("counter") === "total").count()
    assert(counters == 2, "corrupt row must still produce a 'total' increment")
  }
}
