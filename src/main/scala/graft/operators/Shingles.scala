package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk word-n-gram shingling: split once into a token array, then build
  * every n-gram with array ops (`transform(sequence)` + `slice` +
  * `array_join`) and explode — a NARROW generate, no shuffle at all.
  *
  * Round 3 replaced the posexplode + per-doc window-`lead` formulation:
  * that shape shuffled and sorted EVERY TOKEN of the corpus by doc id just
  * to see each token's n−1 successors, and it dominated every shingle
  * consumer's bench time (the minhash/jaccard/decontamination tail of
  * BENCH_r02 — xq05 et al. barely moved when the hash got cheaper because
  * the exchange was the real cost). The array form sees the whole doc in
  * one row, so neighbor access is free; at 100 TB it is embarrassingly
  * parallel map work, and the one doc-keyed exchange the old form paid is
  * gone. Mirrors the DuckDB oracle's `w[i] || ' ' || w[i+1] ...` list CTE.
  *
  * Output rows equal the scalar form exploded: docs shorter than n tokens
  * contribute nothing; `pos` is the 0-based start position of the shingle.
  */
object Shingles {

  def exploded(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    explodedWithPos(docs, textCol, idCol, n).drop("pos")

  /** HASHED shingle stream (id, shingle: long) — the production form: the
    * fused [[graft.expressions.ShingleHashes]] expression digests byte
    * spans of the raw text, so no n-gram string is ever built and every
    * downstream join/distinct/groupBy keys on longs instead of ~30-byte
    * strings (round 4; this was the shared cost of the whole >2x shingle
    * family). Values equal `Md5Prefix60(shingle-string)` bit-for-bit.
    */
  def hashed(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame =
    Parallelize.ensure(docs, col(idCol)).select(col(idCol),
      explode(graft.expressions.ShingleHashes(col(textCol), n)).as("shingle"))

  /** As [[hashed]] with each hash's 0-based start token position. */
  def hashedWithPos(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame =
    Parallelize.ensure(docs, col(idCol)).select(col(idCol),
      posexplode(graft.expressions.ShingleHashes(col(textCol), n))
        .as(Seq("pos", "shingle")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("shingle"))

  /** As [[exploded]] but keeping the 0-based start position of each
    * shingle — the span-level operators (contamination spans) need it.
    */
  def explodedWithPos(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("_toks"))
      .where(size(col("_toks")) >= n)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(_toks) - $n),
           |  i -> struct(CAST(i AS BIGINT) AS pos,
           |              array_join(slice(_toks, i + 1, $n), ' ') AS shingle))"""
          .stripMargin)).as("_s"))
      .select(col(idCol), col("_s.pos").as("pos"), col("_s.shingle").as("shingle"))
}
