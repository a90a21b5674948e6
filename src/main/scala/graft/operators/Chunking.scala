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

  def chunk(docs: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = size_(col("toks"))
    val nChunks = when(n <= size, lit(1L))
      .otherwise(floor((n - size + stride - 1) / stride) + 1L)
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
    * Plan: one doc-keyed shuffle feeds two window passes (trailing-gram
    * hash via lag, then the boundary prefix count) and the chunk regroup —
    * the same per-doc-ordered shape as Shingles; nothing global, nothing
    * all-pairs.
    */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 4, avgSize: Int = 16): DataFrame = {
    require(window >= 1 && avgSize >= 1,
      s"need window >= 1 and avgSize >= 1, got $window/$avgSize")
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val gram = concat_ws(" ",
      ((window - 1) to 1 by -1).map(k => lag(col("tok"), k).over(dw)) :+ col("tok"): _*)
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("tok"))
    val marked = toks.withColumn("gram", gram)
      .withColumn("mark",
        when(col("pos") >= (window - 1) &&
          expr(s"graft_md5p60(gram) % $avgSize") === 0L,
          1L).otherwise(0L))
    // chunk of token i = number of cuts strictly before i
    val cuts = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    marked
      .withColumn("chunk_idx", coalesce(sum(col("mark")).over(cuts), lit(0L)))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** `size` the function, dodging the shadow from the parameter name. */
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c).cast("long")
}
