package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk word-n-gram shingling over the fused
  * [[graft.expressions.ShingleHashes]] expression: byte spans of the raw
  * text are digested in one codegen'd pass, so no n-gram string is ever
  * materialized and the stream is a NARROW generate — no shuffle at all;
  * at 100 TB it is embarrassingly parallel map work.
  *
  * History: round 3 replaced a posexplode + per-doc window-`lead` plan
  * that shuffled every corpus token; round 4 replaced the interpreted
  * `transform(sequence)` string builder with the native expression (the
  * shared cost of the whole >2x shingle family) and dropped the then
  * caller-less string forms — the DuckDB oracles still rebuild shingles
  * from strings (`w[i] || ' ' || w[i+1] ...` CTEs), so the string
  * semantics stay externally differential-tested on every run.
  *
  * Output rows equal the scalar string form exploded: docs shorter than n
  * tokens contribute nothing; `pos` is the 0-based shingle start position.
  */
object Shingles {

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

}
