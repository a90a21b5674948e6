package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vector_dot registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("native VectorDot agrees with the HOF reference formulation") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val both = emb.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("native"),
      VectorFunctions.dotHof(col("embedding"), col("embedding")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
  }

  test("VectorDot null semantics: length mismatch and null element -> null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),              // length mismatch
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))         // ok
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(r(0).isEmpty && r(1).contains(5.0))
  }
}
