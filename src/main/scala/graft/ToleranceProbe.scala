package graft

import org.apache.spark.sql.functions._

/** Measured-tolerance evidence for the four by-design non-hash rows
  * (r16 VERDICT #6): rq28, xq04, xq22, xq61 are `no_oracle` in the
  * correctness gate because their outputs are engine-specific sketches or
  * non-portable binary — but each is SPEC'd against an exact
  * recomputation. This main turns that spec evidence into a committed,
  * re-runnable artifact: for every row it measures the approximation
  * error vs the exact answer (or the exact-twin mismatch count), GATES it
  * at the documented envelope (non-zero exit on violation — it is a
  * check, not a report), and writes one JSON object.
  *
  * Usage: runMain graft.ToleranceProbe <sfDir> <outFile>
  * (committed as tools/tolerance_r17.json at the gate SF, sf0.01)
  */
object ToleranceProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-tolerance")
    import spark.implicits._

    // xq04: HLL approx distinct users per event_type vs exact COUNT
    // DISTINCT. approx_count_distinct's default rsd is 0.05 (1 sigma);
    // the spec envelope (HllSpec's) is ±5%, generous at these
    // cardinalities because the HLL++ sparse mode is near-exact there.
    val xq04 = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select(max(abs(col("approx") - col("exact")) / col("exact")))
      .as[Double].head()

    // rq28: KLL/GK sketch percentiles (accuracy 10000) vs exact
    // percentile, both quantiles, worst group. The sketch guarantees a
    // RANK error <= n/accuracy; on this value distribution that lands
    // far inside a 5% value envelope.
    val rq28 = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("a90"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"))
      .select(max(greatest(
        abs(col("a50") - col("e50")) / col("e50"),
        abs(col("a90") - col("e90")) / col("e90"))))
      .as[Double].head()

    // xq61: DataSketches HLL vocabulary — per-source and merged-global
    // estimates vs exact distinct counts (the query itself carries the
    // exact column; this re-measures it independently).
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    val sk = toks.groupBy("source")
      .agg(expr("hll_sketch_agg(term)").as("sk"),
        countDistinct(col("term")).as("exact"))
    val xq61PerSource = sk
      .select(max(abs(expr("hll_sketch_estimate(sk)") - col("exact")) / col("exact")))
      .as[Double].head()
    val xq61Global = sk
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
      .crossJoin(toks.agg(countDistinct(col("term")).as("exact")))
      .select(abs(col("approx") - col("exact")) / col("exact"))
      .as[Double].head()

    // xq22: frame sampling is rows-only because binary frame bytes don't
    // survive the parquet/pandas oracle bridge — but (doc_id, frame_idx,
    // frame_len) has an EXACT arithmetic twin from n_bytes alone; the
    // mismatch count must be zero (an exact check, tolerance 0).
    val frameBytes = 32
    val stride = 4
    val got = graft.operators.Multimodal.sampleFrames(
      graft.operators.Multimodal.assets(Tables.documents(spark, sfDir)),
      frameBytes = frameBytes, stride = stride)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"))
    val window = frameBytes.toLong * stride
    val expected = graft.operators.Multimodal
      .assets(Tables.documents(spark, sfDir))
      .withColumn("n_frames",
        greatest(floor(col("n_bytes") / lit(window)).cast("int"), lit(0)))
      .where(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("n_bytes"))
      .select(col("doc_id"), col("frame_idx"),
        least(lit(frameBytes.toLong),
          col("n_bytes") - col("frame_idx") * window).as("frame_len"))
    val xq22Mismatch =
      got.exceptAll(expected).count() + expected.exceptAll(got).count()

    val rows = Seq(
      ("xq04_approx_distinct", "max_rel_err_vs_exact_count_distinct",
        xq04, 0.05),
      ("rq28_median_sketch", "max_rel_err_vs_exact_percentile",
        rq28, 0.05),
      ("xq61_hll_vocab", "max_rel_err_per_source_vs_exact",
        xq61PerSource, 0.05),
      ("xq61_hll_vocab_global", "rel_err_merged_union_vs_exact",
        xq61Global, 0.05),
      ("xq22_frame_sample", "mismatch_rows_vs_exact_arithmetic_twin",
        xq22Mismatch.toDouble, 0.0))
    val json = rows.map { case (q, metric, v, env) =>
      s"""  "$q": {"metric": "$metric", "measured": $v, "envelope": $env, """ +
        s""""pass": ${v <= env}}"""
    }.mkString(s"""{\n  "sf_dir": "$sfDir",\n""", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
    rows.filter { case (_, _, v, env) => v > env } match {
      case bad if bad.nonEmpty =>
        System.err.println(s"TOLERANCE VIOLATION: ${bad.map(_._1)}")
        sys.exit(1)
      case _ => ()
    }
  }
}
