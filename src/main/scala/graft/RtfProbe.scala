package graft
import org.apache.spark.sql.functions._
object RtfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "probe")
    val d = "/root/repo/testdata_sf5"
    val emb = Tables.embeddings(spark, d)
    val assigned = operators.Similarity.assign(emb, "embedding", "vec_id", 8)
    val qRow = assigned.where(col("vec_id") === 0L).select(col("embedding").as("q_vec"), col("cluster"))
    val j = assigned.where(col("vec_id") =!= 0L).join(broadcast(qRow), "cluster")
      .select(col("vec_id"), graft.functions.VectorFunctions.cosine(col("embedding"), col("q_vec")).as("sim"))
    println("=== assigned-only plan (codegen markers):")
    assigned.queryExecution.executedPlan.toString.linesIterator.take(8).foreach(println)
    println("=== join plan:")
    j.queryExecution.executedPlan.toString.linesIterator.take(18).foreach(println)
    spark.stop()
  }
}
