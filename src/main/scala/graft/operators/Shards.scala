package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard emission — the LAST-MILE step after tokenize → pack →
  * shuffle: the token-id corpus becomes numbered shards of ~`shardTokens`
  * ids each, plus a manifest a dataloader (or an auditor) can check the
  * bytes against. Documents never split across shards (the standard
  * trainer rule: a shard boundary falls before the doc whose first token
  * would cross it).
  *
  * Scale shape: shard assignment rides [[Sampling.prefixSum]] (two-pass
  * range-partitioned — no global window); the manifest is one exchange
  * keyed by shard id; the binary writer is a shard-keyed `mapGroups`
  * whose state is one shard's bytes (shardTokens × 2 B — a constant
  * chosen to fit an executor, exactly like production shard sizes).
  */
object Shards {

  /** Shard plan over per-doc token counts: (id, n, cum_start, cum_end,
    * shard_id) with shard_id = floor(cum_start / shardTokens) — docs in
    * id order, boundaries at the first doc past each multiple.
    */
  def plan(perDocCounts: DataFrame, idCol: String, nCol: String,
      shardTokens: Long): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    Sampling.prefixSum(perDocCounts, idCol, nCol)
      .withColumn("shard_id", floor(col("cum_start") / shardTokens).cast("long"))
  }

  /** Hash-exact shard manifest from a (id, pos, term_id) token table:
    * per shard — doc count, token count, and an md5 digest of the
    * canonical stream text `id:t1,t2,...|id:t1,...` in (id, pos) order.
    * The digest is what a dataloader-side auditor recomputes from the
    * written bytes; two engines produce it independently (xq95).
    */
  def manifest(tokenIds: DataFrame, idCol: String, posCol: String,
      tidCol: String, shardTokens: Long): DataFrame =
    manifestTail(tokenIds.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"),
        concat(col(idCol).cast("string"), lit(":"),
          array_join(transform(
            array_sort(collect_list(struct(col(posCol).as("p"),
              col(tidCol).cast("string").as("t")))),
            x => x.getField("t")), ",")).as("_doc_str")),
      idCol, shardTokens)

  /** [[manifest]] straight from documents + a vocabulary — the fused form
    * the xq95 pipeline uses. The generic entry point aggregates an
    * EXPLODED (id, pos, term_id) table back into per-doc rows: at sf1 that
    * is a ~50 M-row doc-keyed shuffle that dominated the query (stage
    * probe: map_tokens 5.7 s of 6.2 s total; the digest itself is ~0.5 s).
    * Here the token ids never leave their document row: the vocabulary is
    * collected and broadcast as a hash map (the CountVectorizerModel
    * posture — NOT a map-literal `element_at`, whose GetMapValue is a
    * linear scan per lookup and measured 2× SLOWER than the exploded
    * join) and one mapPartitions pass emits (id, n, doc_str) directly,
    * so the only shuffled rows are the per-doc aggregates — 1000× fewer.
    * Memory bound of the fast path is identical to
    * [[Vocabulary.mapTokens]]'s broadcast join: the vocab must fit an
    * executor. Past `broadcastMaxBytes` (or forced via
    * `sharded = Some(true)`) the call falls back to the SHARDED pipeline —
    * `Vocabulary.mapTokens` with the vocab hash-partitioned on term and
    * joined map-side per shard, then the generic [[manifest]] tail — which
    * re-admits the exploded-token shuffle as the price of never holding the
    * whole vocabulary in one JVM. Digests are identical via both paths
    * (VocabularySpec).
    */
  def manifestOfDocs(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, shardTokens: Long, sharded: Option[Boolean] = None,
      broadcastMaxBytes: Long = Vocabulary.BroadcastMaxBytes): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (sharded.getOrElse(Vocabulary.autoSharded(
        vocab.select(col("term"), col("term_id")), broadcastMaxBytes)))
      return manifest(
        Vocabulary.mapTokens(docs, textCol, idCol, vocab, Some(true)),
        idCol, "pos", "term_id", shardTokens)
    val vmap = vocab.select(col("term"), col("term_id"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(vmap)
    val perDoc = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, text) =>
          // split(" ", -1) keeps trailing empties — the exact semantics of
          // Spark SQL's split(text, ' ') the exploded path tokenizes with
          val toks = text.split(" ", -1)
          val sb = new java.lang.StringBuilder(toks.length * 6)
          sb.append(id).append(':')
          var i = 0
          while (i < toks.length) {
            if (i > 0) sb.append(',')
            sb.append(m.getOrElse(toks(i), 0L))
            i += 1
          }
          (id, toks.length.toLong, sb.toString)
        }
      }
      .toDF(idCol, "n", "_doc_str")
    manifestTail(perDoc, idCol, shardTokens)
  }

  /** Shared manifest tail over per-doc (idCol, n, _doc_str) rows. */
  private def manifestTail(perDocRows: DataFrame, idCol: String,
      shardTokens: Long): DataFrame = {
    // persisted: the frame feeds both the shard plan and the digest join
    // (the repeated-consumer rule), and the caller's final sort would
    // otherwise re-run the whole token aggregation as its sampler pass
    val perDoc = CacheRegistry.persisted(perDocRows)
    val planned = plan(perDoc.select(col(idCol), col("n")), idCol, "n", shardTokens)
    perDoc.join(planned.select(col(idCol), col("shard_id")), Seq(idCol))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
        md5(to_binary(array_join(transform(
          array_sort(collect_list(struct(col(idCol).as("i"), col("_doc_str").as("s")))),
          x => x.getField("s")), "|"), lit("utf-8"))).as("digest"))
  }

  /** REAL binary emission: one little-endian uint16 file per shard (the
    * compact dataloader format for fixture-scale vocabularies; any REAL
    * tokenizer vocab — 32k-200k ids — exceeds uint16 and takes
    * [[writeShardsU32]]), written executor-side from a shard-keyed group —
    * same write posture as EventFiles. Returns
    * (shard_id, n_tokens, n_bytes, path).
    */
  def writeShards(spark: SparkSession, tokenIds: DataFrame, idCol: String,
      posCol: String, tidCol: String, shardTokens: Long, dir: String): DataFrame =
    writeShardsImpl(spark, tokenIds, idCol, posCol, tidCol, shardTokens, dir,
      width = 2)

  /** The uint32 twin: identical plan, shard boundaries, paths and manifest
    * digests (the digest hashes token-id STRINGS, not emitted bytes — see
    * [[manifest]]); only the encoding widens to 4 little-endian bytes per
    * token, covering every production vocabulary size.
    */
  def writeShardsU32(spark: SparkSession, tokenIds: DataFrame, idCol: String,
      posCol: String, tidCol: String, shardTokens: Long, dir: String): DataFrame =
    writeShardsImpl(spark, tokenIds, idCol, posCol, tidCol, shardTokens, dir,
      width = 4)

  private def writeShardsImpl(spark: SparkSession, tokenIds: DataFrame,
      idCol: String, posCol: String, tidCol: String, shardTokens: Long,
      dir: String, width: Int): DataFrame = {
    import spark.implicits._
    val limit = 1L << (8 * width)
    val perDoc = tokenIds.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val planned = plan(perDoc, idCol, "n", shardTokens)
    val rows = tokenIds
      .join(planned.select(col(idCol), col("shard_id")), Seq(idCol))
      .select(col("shard_id"), col(idCol).as("_id"), col(posCol).as("_pos"),
        col(tidCol).cast("long").as("_tid"))
      .as[(Long, Long, Long, Long)]
    rows.groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val toks = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
        val bytes = new Array[Byte](toks.length * width)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          // fail loudly: a silent low-byte truncation would emit corrupt
          // shards only an external digest audit could catch
          require(t >= 0 && t < limit,
            s"token id $t in shard $shard exceeds uint${8 * width} range" +
              (if (width == 2) "; use writeShardsU32" else ""))
          var b = 0
          while (b < width) {
            bytes(width * i + b) = ((t >> (8 * b)) & 0xFF).toByte
            b += 1
          }
          i += 1
        }
        val path = java.nio.file.Paths.get(dir, f"shard-$shard%05d.bin")
        java.nio.file.Files.createDirectories(path.getParent)
        java.nio.file.Files.write(path, bytes)
        (shard, toks.length.toLong, bytes.length.toLong, path.toString)
      }
      .toDF("shard_id", "n_tokens", "n_bytes", "path")
  }
}
