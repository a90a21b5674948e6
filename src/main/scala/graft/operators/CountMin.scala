package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATION — fixed-memory frequency estimation for
  * heavy-hitter work at corpus scale.
  *
  * An exact term-frequency groupBy keys the shuffle by every distinct term
  * (billions at 100 TB). The count-min sketch replaces it with a d×w table
  * of counters: each occurrence increments one bucket per hash row, and a
  * term's estimate is the MIN over its d cells — an upper-biased estimate
  * with error ≤ 2N/w at 1−(1/2)^d confidence (Cormode & Muthukrishnan).
  * Here the sketch IS a DataFrame of (r, b, c): the aggregation state is
  * d·w rows NO MATTER the corpus size, two sketches merge by summing cells,
  * and estimates are a broadcast join against candidates — all relational,
  * no driver-side sketch object (Spark's `df.stat.countMinSketch` builds
  * one on the driver; this form stays distributed and oracle-checkable).
  *
  * Hashing is the repo's portable md5→60-bit idiom with per-row salts, so
  * the full sketch, estimates, and overestimates hash-match DuckDB (xq58).
  */
object CountMin {

  private def bucket(termCol: String, r: Int, w: Int) =
    expr(s"graft_md5p60(concat('cms$r:', $termCol)) % $w")

  /** The d×w sketch table (r, b, c) over `termCol` occurrences. */
  def sketch(df: DataFrame, termCol: String, d: Int, w: Int): DataFrame =
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(termCol, r, w).as("b"))): _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `candidates(termCol)` against a sketch: min over
    * the d probed cells. Candidates join broadcast against the (tiny)
    * sketch — map-side at any scale.
    */
  def estimate(cms: DataFrame, candidates: DataFrame, termCol: String,
      d: Int, w: Int): DataFrame = {
    val probes = candidates.select(col("*"),
      explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(termCol, r, w).as("b"))): _*)).as("cell"))
      .select(col("*"), col("cell.r").as("r"), col("cell.b").as("b"))
      .drop("cell")
    probes.join(broadcast(cms), Seq("r", "b"))
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(col("c")).as("estimate"))
  }
}
