package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the distributed prefix-sum family and the
  * temperature mix over arbitrary inputs: the invariants that must hold at
  * ANY size/partitioning, sampled over fixed seeds (plain ScalaCheck Gen —
  * the scalatest-scalacheck bridge isn't in the dependency set).
  */
class PrefixSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomDocs(trial: Long, maxN: Int): Seq[(Long, Long)] = {
    val gen = for {
      n <- Gen.choose(1, maxN)
      sizes <- Gen.listOfN(n, Gen.choose(0L, 300L))
      ids <- Gen.pick(n, 1L to 10000L)
    } yield ids.toSeq.zip(sizes)
    gen.apply(Gen.Parameters.default, Seed(trial)).get
  }

  test("prefixSum equals the sequential scan for arbitrary id/size sets") {
    (1 to 5).foreach { trial =>
      val rows = randomDocs(trial, 120)
      val df = rows.toDF("id", "n").repartition(trial.toInt + 2)
      val got = Sampling.prefixSum(df, "id", "n")
        .select("id", "n", "cum_start", "cum_end")
        .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
      var cum = 0L
      val expected = rows.sortBy(_._1).map { case (id, n) =>
        val s = cum; cum += n; (id, n, s, s + n)
      }
      assert(got == expected, s"trial $trial")
    }
  }

  test("context windows partition every doc's tokens for arbitrary corpora") {
    (1 to 5).foreach { trial =>
      val rows = randomDocs(trial + 100, 80)
      val w = 64L
      val df = rows.toDF("id", "n").repartition(3)
      val got = Sampling.contextWindows(df, "id", "n", w)
        .as[(Long, Long, Long)].collect().toSeq
      // every token of every nonzero doc lands in exactly one window
      val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      rows.filter(_._2 > 0).foreach { case (id, n) =>
        assert(byDoc.getOrElse(id, 0L) == n, s"trial $trial doc $id")
      }
      assert(got.forall(r => r._3 > 0 && r._3 <= w), s"trial $trial bounds")
      // windows are full except possibly the last
      val byWin = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      if (byWin.nonEmpty) {
        val last = byWin.keys.max
        byWin.foreach { case (win, tot) =>
          if (win != last) assert(tot == w, s"trial $trial window $win=$tot")
        }
      }
    }
  }

  test("cdc chunks reassemble any random corpus exactly") {
    (1 to 3).foreach { trial =>
      val gen = for {
        n <- Gen.choose(1, 12)
        texts <- Gen.listOfN(n, for {
          len <- Gen.choose(1, 120)
          toks <- Gen.listOfN(len, Gen.choose(0, 40).map(i => s"w$i"))
        } yield toks.mkString(" "))
      } yield texts
      val texts = gen.apply(Gen.Parameters.default, Seed(trial + 900L)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(3)
      val chunks = graft.operators.Chunking.cdcChunks(docs, "text", "doc_id",
        window = 4, avgSize = 8)
        .orderBy("doc_id", "chunk_idx")
        .select("doc_id", "chunk_text", "n_tokens")
        .as[(Long, String, Long)].collect().toSeq
      val byDoc = chunks.groupBy(_._1)
      texts.zipWithIndex.foreach { case (t, i) =>
        val parts = byDoc(i.toLong)
        assert(parts.map(_._2).mkString(" ") == t, s"trial $trial doc $i")
        assert(parts.map(_._3).sum == t.split(" ", -1).length.toLong)
        assert(parts.forall(_._3 > 0))
      }
    }
  }

  test("temperature mix: targets sum <= total, alpha=1 ~ proportional") {
    (1 to 3).foreach { trial =>
      val gen = for {
        nStrata <- Gen.choose(2, 6)
        counts <- Gen.listOfN(nStrata, Gen.choose(5, 200))
      } yield counts
      val counts = gen.apply(Gen.Parameters.default, Seed(trial + 500L)).get
      val rows = counts.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => (s.toLong * 1000 + i, s"s$s"))
      }
      val df = rows.toDF("id", "stratum")
      val total = 100L
      val kept = Sampling.temperatureMix(df, "stratum", "id", total, alpha = 0.5)
        .groupBy("stratum").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(kept.values.sum <= total, s"trial $trial oversampled")
      // flattening: ordering of per-stratum sample counts follows corpus
      // counts (monotone), but ratios compress toward each other
      val corpus = counts.zipWithIndex.map { case (n, s) => s"s$s" -> n.toLong }.toMap
      val ordered = corpus.toSeq.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq((a, na), (b, nb)) if na < nb =>
          assert(kept.getOrElse(a, 0L) <= kept.getOrElse(b, 0L) + 1,
            s"trial $trial monotonicity $a/$b")
        case _ => ()
      }
    }
  }
}
