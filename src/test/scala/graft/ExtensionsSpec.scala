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

  test("Md5Prefix60 is bit-identical to the conv(substr(md5)) idiom") {
    // Random-ish corpus strings + adversarial cases: empty, single space,
    // multi-byte UTF-8, long text. The old idiom is the proven DuckDB twin,
    // so value equality here transfers the cross-engine proof.
    val docs = Tables.documents(spark, sf).select(col("text")).limit(500)
      .unionAll(Seq("", " ", "héllo wörld", "日本語テキスト", "a" * 10000,
        "mixed 日本 ascii", "\t\n").toDF("text"))
    val both = docs.select(
      graft.expressions.Md5Prefix60(col("text")).as("native"),
      expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("legacy"),
      expr("shiftright(graft_md5p60(text), 44)").as("native4"),
      expr("CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)").as("legacy4"),
      expr("shiftright(graft_md5p60(text), 12)").as("native12"),
      expr("CAST(conv(substr(md5(text), 1, 12), 16, 10) AS BIGINT)").as("legacy12"))
    assert(both.where(col("native") =!= col("legacy") ||
      col("native4") =!= col("legacy4") ||
      col("native12") =!= col("legacy12")).count() == 0)
    assert(both.where(col("native") < 0L).count() == 0) // unsigned 60-bit
  }

  test("Md5Windows60 windows are bit-identical to the substr idioms; null propagates") {
    // Element 0 must equal Md5Prefix60 (hex 1-15); element 1 is hex 17-31 —
    // the same windows the DuckDB twins take with substr(d,1,15)/substr(d,17,15).
    val docs = Tables.documents(spark, sf).select(col("text")).limit(200)
      .unionAll(Seq("", " ", "héllo wörld", "日本語テキスト", "a" * 10000).toDF("text"))
    val both = docs.selectExpr(
      "graft_md5w60(text)[0] AS w0",
      "graft_md5p60(text) AS p60",
      "graft_md5w60(text)[1] AS w1",
      "CAST(conv(substr(md5(text), 17, 15), 16, 10) AS BIGINT) AS legacy1")
    assert(both.where(col("w0") =!= col("p60") || col("w1") =!= col("legacy1"))
      .count() == 0)
    assert(both.where(col("w0") < 0L || col("w1") < 0L).count() == 0)
    val r = Seq(Option("x"), None).toDF("s")
      .selectExpr("graft_md5w60(s) AS h").collect().map(r => Option(r.get(0)))
    assert(r(0).isDefined && r(1).isEmpty)
  }

  test("Md5Prefix60 null propagates; SQL registration works") {
    val r = Seq(Option("x"), None).toDF("s")
      .selectExpr("graft_md5p60(s) AS h").collect().map(r => Option(r.get(0)))
    assert(r(0).isDefined && r(1).isEmpty)
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
