package graft

import graft.expressions.{TermCounts, TopKRows}
import org.apache.spark.sql.functions._

/** TopKRows (grouped bounded top-k aggregate) must reproduce the
  * row_number-window form exactly — same rows, same order — including
  * across partial/merge boundaries (partial aggregation is the operator's
  * whole point), and TermCounts must reproduce the explode+groupBy term
  * table under split(s, " ") semantics including empty tokens.
  */
class TopKRowsSpec extends SparkSpec {

  test("top-k agg == row_number window, across partitions and merges") {
    import spark.implicits._
    // many groups, deliberate ties in score (unique id tiebreak), spread
    // over partitions so partial buffers MUST merge
    val rows = for {
      g <- 0 until 37
      i <- 0 until 50
    } yield (s"g$g", s"id${i % 43}_$g$i", (i % 7).toDouble / 3.0, i.toLong)
    val df = spark.createDataset(rows).toDF("key", "id", "score", "payload")
      .repartition(13)

    val viaAgg = df.groupBy(col("key"))
      .agg(TopKRows(struct(col("score"), col("id"), col("payload")), 5,
        Seq(true, false)).as("_top"))
      .select(col("key"), posexplode(col("_top")))
      .select(col("key"), (col("pos") + 1).as("rk"),
        col("col.score").as("score"), col("col.id").as("id"),
        col("col.payload").as("payload"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val viaWindow = df
      .withColumn("rk", row_number().over(w).cast("int"))
      .where(col("rk") <= 5)
      .select(col("key"), col("rk"), col("score"), col("id"), col("payload"))

    val a = viaAgg.as[(String, Int, Double, String, Long)].collect().sorted
    val b = viaWindow.as[(String, Int, Double, String, Long)].collect().sorted
    assert(a.length == 37 * 5)
    assert(a.toSeq == b.toSeq, "aggregate must equal the window form exactly")
  }

  test("k larger than group emits the whole group, ascending keys ordered") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L))
      .toDF("key", "v").repartition(3)
    val got = df.groupBy(col("key"))
      .agg(TopKRows(struct(col("v")), 10, Seq(false)).as("_t"))
      .select(col("key"), posexplode(col("_t")))
      .select(col("key"), col("col.v"))
      .as[(String, Long)].collect().toSeq
    assert(got.sorted == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L)))
    // rank order inside a group is ascending under desc=false
    val aOnly = df.where(col("key") === "a").groupBy(col("key"))
      .agg(TopKRows(struct(col("v")), 10, Seq(false)).as("_t"))
      .select(explode(col("_t.v")).as("v")).as[Long].collect().toSeq
    assert(aOnly == Seq(1L, 2L, 3L))
  }

  test("term_counts == explode+groupBy table, incl. empty-token semantics") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "a b a  c"), // double space -> empty token, like split(s, " ")
      ("d2", ""), // one empty token, dl = 1
      ("d3", "x")).toDF("doc_id", "text")

    val viaExpr = docs
      .select(col("doc_id"), explode(TermCounts(col("text"))).as("_t"))
      .select(col("doc_id"), col("_t.term"), col("_t.tf"), col("_t.dl"))
      .as[(String, String, Long, Long)].collect().toSet

    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .as[(String, String, Long, Long)].collect().toSet

    assert(viaExpr == viaAgg)
    assert(viaExpr.exists { case (d, t, tf, dl) => d == "d1" && t == "" && tf == 1 && dl == 5 })
    assert(viaExpr.exists { case (d, t, tf, dl) => d == "d2" && t == "" && tf == 1 && dl == 1 })
  }
}
