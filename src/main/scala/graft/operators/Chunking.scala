package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window document chunking — the pre-tokenization splitting stage
  * of a training pipeline: each document becomes ceil((n-size)/stride)+1
  * fixed-size token windows with `overlap` tokens shared between
  * neighbors (stride = size - overlap); the final window may be shorter.
  *
  * Pure narrow plan: split → explode(sequence) → slice/array_join — one
  * codegen'd pass, no shuffle at all; chunking 100 TB is embarrassingly
  * parallel and this plan keeps it that way.
  */
object Chunking {

  /** Number of chunks [[chunk]] emits for a token array — exposed so
    * consumers needing per-doc chunk totals (xq38's n_paras) can compute
    * them as a NARROW map over the source docs instead of re-counting the
    * exploded chunk rows through an id-keyed exchange (r18). Null for null
    * token arrays (such docs explode to zero rows and vanish from chunk
    * output — callers must filter).
    */
  def chunkCount(toks: org.apache.spark.sql.Column, size: Int,
      overlap: Int): org.apache.spark.sql.Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = size_(toks)
    when(n <= size, lit(1L))
      .otherwise(floor((n - size + stride - 1) / stride) + 1L)
  }

  def chunk(docs: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val nChunks = chunkCount(col("toks"), size, overlap)
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("toks"),
          (col("chunk_idx") * stride + 1L).cast("int"), lit(size)), " ").as("chunk_text"),
        least(lit(size.toLong),
          size_(col("toks")) - col("chunk_idx") * stride).as("n_tokens"))
  }

  /** Content-defined chunking (the rsync/LBFS boundary trick): cut the
    * token stream AFTER every position whose trailing `window`-gram hashes
    * to 0 mod `avgSize` — boundaries are a pure function of local CONTENT,
    * not position, so inserting or deleting tokens shifts only the chunks
    * that contain the edit and every later chunk realigns (fixed-size
    * chunking loses all alignment after one insertion). Chunk-hash equality
    * across documents therefore detects SHIFTED shared content — the dedup
    * regime position-based chunking cannot see. Expected chunk length ≈
    * avgSize tokens.
    *
    * Output: (idCol, chunk_idx, start_pos, n_tokens, chunk_text, chunk_hash).
    * Plan (round 3): fully array-based and NARROW — cut positions come from
    * a `filter(sequence)` over the token array (trailing gram = slice +
    * array_join, hashed with the native graft_md5p60), chunk spans from the
    * cut list, then one explode. The previous form paid a doc-keyed shuffle
    * plus TWO window passes plus a collect_list regroup for what is a pure
    * per-document computation; this shape is map-only at any scale.
    *
    * A cut AFTER token p means token p+1 starts a new chunk, so chunk
    * starts = 0 :: (cuts + 1), with a trailing cut at the last token
    * producing no empty chunk (starts are filtered to < n_tokens).
    */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 4, avgSize: Int = 16): DataFrame = {
    require(window >= 1 && avgSize >= 1,
      s"need window >= 1 and avgSize >= 1, got $window/$avgSize")
    val w1 = window - 1
    val prep = docs
      .select(col(idCol), split(col(textCol), " ").as("_toks"))
      .withColumn("_starts", expr(
        s"""filter(
           |  concat(array(CAST(0 AS BIGINT)),
           |         transform(
           |           filter(if(size(_toks) >= $window,
           |                     sequence($w1, size(_toks) - 1), array()),
           |                  p -> graft_md5p60(array_join(
           |                         slice(_toks, p - $w1 + 1, $window), ' '))
           |                       % $avgSize = 0),
           |           p -> CAST(p + 1 AS BIGINT))),
           |  s -> s < size(_toks))""".stripMargin))
    prep
      .select(col(idCol), col("_toks"), col("_starts"),
        explode(expr("sequence(0, size(_starts) - 1)")).as("_ci"))
      .select(col(idCol), col("_ci").cast("long").as("chunk_idx"),
        expr("_starts[_ci]").as("start_pos"),
        expr("coalesce(get(_starts, CAST(_ci + 1 AS INT)), CAST(size(_toks) AS BIGINT)) - _starts[_ci]")
          .as("n_tokens"),
        expr("""array_join(slice(_toks, CAST(_starts[_ci] + 1 AS INT),
               |  CAST(coalesce(get(_starts, CAST(_ci + 1 AS INT)), CAST(size(_toks) AS BIGINT))
               |       - _starts[_ci] AS INT)), ' ')""".stripMargin)
          .as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** `size` the function, dodging the shadow from the parameter name. */
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c).cast("long")
}
