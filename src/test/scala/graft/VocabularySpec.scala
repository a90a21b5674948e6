package graft

import graft.operators.Vocabulary
import org.apache.spark.sql.functions._

/** Edge cases of the coverage/OOV report the xq97 oracle's happy path does
  * not pin: an all-OOV source, exact ratio arithmetic, and OOV TYPE
  * (distinct) vs occurrence counting.
  */
class VocabularySpec extends SparkSpec {
  import spark.implicits._

  test("coverageReport: all-OOV source, exact ratio, distinct OOV types") {
    val docs = Seq(
      (1L, "a a a b", "s1"), // a:3 b:1
      (2L, "a b c c", "s1"), // c twice in one doc
      (3L, "zz zz yy", "s2") // s2 shares nothing with the vocab
    ).toDF("doc_id", "text", "source")
    // vocab = terms with corpus count >= 3: a (4), zz... zz has 2 -> out; c 2 -> out
    val vocab = Vocabulary.build(docs, "text", minCount = 3L)
    assert(vocab.select("term").collect().map(_.getString(0)).toSet == Set("a"))
    val rep = Vocabulary.coverageReport(docs, "text", "source", vocab)
      .orderBy("source").collect()
    val s1 = rep(0)
    assert(s1.getString(0) == "s1")
    assert(s1.getLong(1) == 8L && s1.getLong(2) == 4L) // 8 tokens, 4 'a'
    assert(s1.getDouble(3) == 4.0 / 8.0) // exact IEEE division
    assert(s1.getLong(4) == 2L) // OOV TYPES b, c — not 4 occurrences
    val s2 = rep(1)
    assert(s2.getString(0) == "s2")
    assert(s2.getLong(2) == 0L && s2.getDouble(3) == 0.0 && s2.getLong(4) == 2L)
  }

  test("sharded vocab join == broadcast path (mapTokens and manifestOfDocs)") {
    val docs = Tables.documents(spark, sf)
    val vocab = Vocabulary.build(docs, "text", minCount = 5L)

    // mapTokens: identical (id, pos, term_id) rows via both join strategies
    def rows(sharded: Boolean) =
      Vocabulary.mapTokens(docs, "text", "doc_id", vocab, Some(sharded))
        .as[(Long, Long, Long)].collect().toSet
    val viaBroadcast = rows(sharded = false)
    val viaSharded = rows(sharded = true)
    assert(viaSharded == viaBroadcast && viaBroadcast.nonEmpty)

    // sharded plan shape: the TERM join must not be broadcast — the whole
    // point is that no single JVM holds the full vocabulary. (The vocab
    // build's globalRank keeps its metadata-scale per-partition-offset
    // broadcast; only the (token ⋈ vocab) dim join is under test.)
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = Vocabulary.mapTokens(docs, "text", "doc_id", vocab, Some(true))
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    val termJoins = plan.collect {
      case j: BaseJoinExec if j.leftKeys.exists(_.toString.contains("term")) => j
    }
    assert(termJoins.nonEmpty, s"expected a term join in:\n$plan")
    assert(termJoins.forall(j => !j.isInstanceOf[BroadcastHashJoinExec] &&
        !j.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"sharded path must not broadcast the vocab:\n$plan")

    // manifestOfDocs: identical shard digests via the collected-map fast
    // path and the sharded exploded pipeline
    def digests(sharded: Boolean) =
      graft.operators.Shards
        .manifestOfDocs(docs, "text", "doc_id", vocab, 4096L, Some(sharded))
        .as[(Long, Long, Long, String)].collect().toSet
    assert(digests(sharded = true) == digests(sharded = false))
  }

  test("the size switch broadcasts small vocabs and shards past the cap") {
    val docs = Tables.documents(spark, sf)
    val vocab = Vocabulary.build(docs, "text", minCount = 5L)
    assert(!Vocabulary.autoSharded(vocab, Vocabulary.BroadcastMaxBytes),
      "a min-count fixture vocab must take the broadcast fast path")
    assert(Vocabulary.autoSharded(vocab, 1L),
      "a vocab past the byte cap must take the sharded path")
  }
}
