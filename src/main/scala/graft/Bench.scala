package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * A short warm-up runs first (untimed) so JIT/codegen compilation and
  * broadcast machinery don't land in the first measured query — standard
  * JVM-bench practice; steady-state per-query time is what scales to a real
  * cluster, where a session is long-lived.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // local-iteration aid (same contract as Verify): GRAFT_ONLY=xq32,...
    // restricts the run; the driver never sets it.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").toSet)
    val defs = SparkEntry.allDefs.filter(q => only.forall(_.contains(q.name)))

    // Full materialization through the noop sink: unlike count(), Catalyst
    // cannot prune away the measured computation (count() would skip e.g.
    // an entire signature calculation), and nothing is buffered.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm-up: every query once at smoke scale (untimed) so per-plan-shape
    // codegen + JIT compilation is out of the measured runs — measured
    // numbers are steady-state, which is what a long-lived session delivers.
    val warmDir = "/root/testdata/sf0.001"
    defs.foreach { q =>
      try {
        queries.QueryDef.applyConfs(spark, q.confs)
        materialize(q.run(spark, warmDir))
      } catch { case _: Throwable => () } }
    // Warm-up caches key on warmDir plans — unreachable from the measured
    // sfDir runs, so dropping them frees memory without touching timing
    // semantics (measured rounds keep their historical cache behavior).
    operators.CacheRegistry.releaseAll(spark)

    // Two full measured rounds, per-query min: round 1 doubles as at-scale
    // warm-up (JIT compilation of the 50 plan shapes drains during it), so
    // round 2 delivers steady-state numbers — measurements showed up to 10x
    // first-run noise from the C2 compile backlog otherwise.
    // A failed query records -1, NOT its time-to-failure — a broken query
    // must be distinguishable from a fast one in the emitted JSON.
    def timeAll(): Seq[(String, Double)] = defs.map { q =>
      val t0 = System.nanoTime()
      val ok = try {
        queries.QueryDef.applyConfs(spark, q.confs)
        materialize(q.run(spark, sfDir)); true
      } catch { case _: Throwable => false }
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Tracked caches are released BETWEEN the measured rounds: Spark's
    // CacheManager substitutes plan-equal subtrees, so a query whose
    // (now top-level) result frame is persisted would otherwise reduce to
    // a pure cache read in round 2 and the per-query min would measure
    // nothing. Within a round, persist benefits (shared intermediates,
    // sampler-pass reuse) still count — that is the steady-state a
    // long-lived session actually delivers per fresh query.
    val rounds = Seq(timeAll(), {
      operators.CacheRegistry.releaseAll(spark); timeAll()
    })
    val results = defs.map(_.name).map { n =>
      val valid = rounds.map(_.toMap.apply(n)).filter(_ >= 0)
      n -> (if (valid.nonEmpty) valid.min else -1.0)
    }
    val errors = results.collect { case (n, v) if v < 0 => "\"" + n + "\"" }
    // ms precision: per-query noise floor is far above 1 ms, and a shorter
    // line survives longer in the harness's bounded (last-2000-chars) tail.
    def ms(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // oracle-only queries (deliberately non-scale plans kept as correctness
    // proofs for a sketch/scale-path twin) are reported separately so the
    // headline reflects the plans a production run would use.
    val oracleOnly = defs.filter(_.oracleOnly).map(_.name).toSet
    val scaleTotal = results
      .collect { case (n, v) if v >= 0 && !oracleOnly(n) => v }.sum
    val ooJson = oracleOnly.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Key order is deliberate: the harness snapshots only the LAST 2000
    // chars of stdout, so the verdict-bearing keys (errors, totals, metric)
    // go at the END of the line — a front-truncated tail still reads them.
    val line = s"""{"queries":$qs,"oracle_only":$ooJson,"errors":${errors.mkString("[", ",", "]")},"scale_path_total":${ms(scaleTotal)},"value":${ms(total)},"unit":"sec","sf":"$sfDir","metric":"total"}"""
    // Durable twin of the stdout line: the full per-query map outlives any
    // tail truncation (committed per round alongside BASELINE.md).
    try {
      val w = new java.io.PrintWriter("BENCH_LAST.json", "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    println(line)
    // FINAL stdout line is a short summary (~200 chars) that a bounded
    // last-N-chars tail can never truncate: the harness that snapshots
    // only the tail of stdout always sees one complete, parseable JSON
    // line with the verdict-bearing fields; the per-query map lives in
    // the full line above and in BENCH_LAST.json.
    val summary = s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","scale_path_total":${ms(scaleTotal)},"n_queries":${results.size},"n_errors":${errors.size},"queries_file":"BENCH_LAST.json"}"""
    println(summary)
    spark.stop()
  }
}
