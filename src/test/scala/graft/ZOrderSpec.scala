package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places x bits at even and y bits at odd positions") {
    // x=5 (101), y=3 (011): set positions {0,1,3,4} -> 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), bits = 3).as("z"))
      .collect()(0).getLong(0)
    assert(got == 27L, s"interleave(5,3)=27 expected, got $got")
    // identity checks: y=0 spreads x onto even bits; x=0 onto odd bits
    val spread = Seq((7L, 0L), (0L, 7L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(spread == Seq(21L, 42L))
  }

  test("z-layout prunes on the second dimension where a linear sort cannot") {
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_partkey").cast("long").as("x"), col("l_suppkey").cast("long").as("y"))
    val nParts = 8

    // boxes per write unit: (partition -> [ymn,ymx])
    def yBoxes(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("ymn"), max("y").as("ymx"))
        .select("ymn", "ymx").as[(Long, Long)].collect()

    val zBoxes = yBoxes(ZOrder.layout(pts, "x", "y", nParts))
    val linBoxes = yBoxes(pts.repartitionByRange(nParts, col("x"))
      .sortWithinPartitions("x"))

    // a selective filter on y (the non-sort dimension)
    val (ymin, ymax) = pts.agg(min("y"), max("y")).as[(Long, Long)].collect()(0)
    val lo = ymin
    val hi = ymin + (ymax - ymin) / 5
    def hits(boxes: Array[(Long, Long)]) =
      boxes.count { case (a, b) => a <= hi && lo <= b }

    val zHits = hits(zBoxes)
    val linHits = hits(linBoxes)
    assert(linHits == nParts,
      s"x-sorted files all span the full y range (got $linHits/$nParts)")
    assert(zHits < linHits,
      s"z-layout must let a y filter skip files: z=$zHits lin=$linHits")
  }
}
