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

  /** `size` the function, dodging the shadow from the parameter name. */
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c).cast("long")
}
