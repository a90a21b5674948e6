package graft
/** Dumps formatted physical plans of headline queries for scale review. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit")
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "pq02_counter_fanout", "rq04_revenue_per_nation", "rq15_row_number",
      "xq06_minhash_pairs", "xq02_cosine_topk", "pq13_sessionize", "xq23_top_terms",
      "rq29_range_join", "xq55_bloom_semijoin", "xq57_pq_topk", "xq60_pagerank",
      "rq44_tpch_q19", "xq71_fuzzy_dedup", "xq75_cdc_shifted_dedup",
      "xq80_train_classifier", "xq85_split_leakage")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
