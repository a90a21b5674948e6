package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-pipeline step that flags
  * training documents sharing n-gram content with an evaluation set.
  *
  * Shape: distinct shingles per train doc ⋈ the eval set's distinct shingle
  * vocabulary (broadcast when the eval set is small — the usual case),
  * grouped back per doc. contamination = shared / total shingles. At 100 TB
  * the eval vocabulary stays broadcastable (benchmarks are small by
  * definition) so the whole check is one map-side join + one narrow shuffle
  * keyed by doc.
  */
object Decontamination {

  def contamination(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    val ts = Shingles.exploded(train, textCol, idCol, n).distinct()
    val es = Shingles.exploded(eval, textCol, idCol, n)
      .select("shingle").distinct()
    val counts = ts.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val shared = ts.join(broadcast(es), "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    counts.join(shared, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
  }

  /** Boilerplate/repetition score: 1 - distinct/total shingles per doc —
    * high values flag template or repeated content.
    */
  def repetition(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame =
    Shingles.exploded(docs, textCol, idCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("shingle")).as("n_distinct"))
      .select(col(idCol), col("n_total"), col("n_distinct"),
        (lit(1.0d) - col("n_distinct").cast("double") / col("n_total").cast("double"))
          .as("repetition"))
}
