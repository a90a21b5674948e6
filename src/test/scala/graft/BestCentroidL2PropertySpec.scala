package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the native argmin-L2 assignment over ARBITRARY
  * codebooks and vectors (the r17 xq57 fix): for any sub-grouped codebook
  * and any vector set — including exact ties, negative/zero coordinates,
  * and degenerate one-centroid groups — the expression must equal the
  * explode→broadcast-join→min_by join form it replaced, winner AND d2,
  * under any partitioning. Fixed seeds (plain ScalaCheck Gen — the
  * scalatest bridge isn't in the dependency set).
  */
class BestCentroidL2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def l2d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b)) +
      VectorFunctions.dot(b, b)

  // coordinates from a small grid so exact d2 TIES actually occur and
  // exercise the smallest-cluster tie-break, not just generic argmin
  private def gridVec(dims: Int): Gen[Seq[Double]] =
    Gen.listOfN(dims, Gen.oneOf(-2.0d, -1.0d, 0.0d, 0.5d, 1.0d, 2.0d))

  private def scenario(trial: Long): (Map[Int, Seq[(Long, Seq[Double])]], Seq[(Long, Int, Seq[Double])]) = {
    val gen = for {
      dims <- Gen.choose(1, 5)
      nSubs <- Gen.choose(1, 3)
      cb <- Gen.sequence[Seq[(Int, Seq[(Long, Seq[Double])])], (Int, Seq[(Long, Seq[Double])])](
        (0 until nSubs).map { s =>
          for {
            k <- Gen.choose(1, 6)
            cents <- Gen.listOfN(k, gridVec(dims))
          } yield (s, cents.zipWithIndex.map { case (c, i) => (i.toLong, c) })
        })
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        sub <- Gen.choose(0, nSubs - 1)
        v <- gridVec(dims)
      } yield (sub, v))
    } yield (cb.toMap, rows.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) })
    gen.apply(Gen.Parameters.default, Seed(trial)).get
  }

  test("expression == join form for arbitrary codebooks (winner and d2)") {
    (1 to 8).foreach { trial =>
      val (cb, rows) = scenario(trial.toLong)
      val df = rows.toDF("id", "sub", "v").repartition(1 + trial % 4)
      val best = graft.expressions.BestCentroidL2.column(col("sub"), col("v"), cb)
      val got = df.select(col("id"), best.getField("cluster").as("code"),
          best.getField("d2").as("d2"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val cbDf = cb.toSeq.flatMap { case (s, cs) =>
        cs.map { case (cid, cvec) => (s, cid, cvec) } }
        .toDF("sub", "cluster", "cvec")
      val ref = df.join(broadcast(cbDf), "sub")
        .select(col("id"), col("cluster"), l2d2(col("v"), col("cvec")).as("d2"))
        .groupBy("id")
        .agg(min(struct(col("d2"), col("cluster"))).as("m"))
        .select(col("id"), col("m.cluster"), col("m.d2"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == ref, s"trial $trial")
    }
  }

  test("ties break to the smallest cluster id, verified against brute force") {
    (100 to 104).foreach { trial =>
      val (cb, rows) = scenario(trial.toLong)
      val df = rows.toDF("id", "sub", "v")
      val got = df.select(col("id"),
          graft.expressions.BestCentroidL2.column(col("sub"), col("v"), cb)
            .getField("cluster").as("code"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side brute force with the same strict fold
      def dot(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0d; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      rows.foreach { case (id, sub, v) =>
        val cands = cb(sub).map { case (cid, c) =>
          (cid, (dot(v, v) - 2.0d * dot(v, c)) + dot(c, c)) }
        val bestD2 = cands.map(_._2).min
        val want = cands.filter(_._2 == bestD2).map(_._1).min
        assert(got(id) == want, s"trial $trial id $id")
      }
    }
  }
}
