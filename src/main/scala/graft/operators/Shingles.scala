package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bulk word-n-gram shingling: posexplode tokens, then window `lead`s over
  * (doc, position) build each n-gram — every operator codegen'd, no
  * interpreted higher-order lambdas (the scalar `TextFunctions.shingles`
  * form is kept for composition/tests; this is the corpus-scale path).
  *
  * One shuffle keyed by doc id (the window partition); at 100 TB that
  * exchange is unavoidable for any per-doc ordered computation and the key
  * space (doc ids) is uniform. Output rows equal the scalar form exploded:
  * docs shorter than n tokens contribute nothing.
  */
object Shingles {

  def exploded(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    explodedWithPos(docs, textCol, idCol, n).drop("pos")

  /** As [[exploded]] but keeping the 0-based start position of each
    * shingle — the span-level operators (contamination spans) need it.
    */
  def explodedWithPos(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val leadCols = (1 until n).map(k => lead(col("tok"), k).over(w).as(s"t$k"))
    toks.select((col(idCol) +: col("pos").cast("long").as("pos") +: col("tok") +: leadCols): _*)
      .where(col(s"t${n - 1}").isNotNull)
      .select(col(idCol), col("pos"),
        concat_ws(" ", col("tok") +: (1 until n).map(k => col(s"t$k")): _*).as("shingle"))
  }
}
