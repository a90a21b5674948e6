package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("asset schema: binary payload + typed metadata") {
    val a = Multimodal.assets(Tables.documents(spark, sf))
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.schema("n_bytes").dataType.typeName == "long")
    val r = a.orderBy("doc_id").select("n_bytes").head().getLong(0)
    assert(r > 0)
  }

  test("feature extraction is deterministic under repartitioning") {
    val assets = Multimodal.assets(Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(spark, assets)
      .toDF().orderBy("doc_id").collect().toSeq
    val f2 = Multimodal.extractFeatures(spark, assets.repartition(13))
      .toDF().orderBy("doc_id").collect().toSeq
    assert(f1.map(_.toString) == f2.map(_.toString))
  }

  test("approx_count_distinct within 15% of exact") {
    val e = Tables.events(spark, sf)
    val exact = e.agg(countDistinct("user_id")).head().getLong(0)
    val approx = e.agg(approx_count_distinct("user_id")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }
}
