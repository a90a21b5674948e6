package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * `dot` is a native Catalyst expression (graft.expressions.VectorDot) with
  * a fused codegen loop — the higher-order-function formulation
  * (`aggregate(zip_with(...))`, kept as `dotHof` for cross-checking) is
  * interpreted per element and was ~100x slower in the all-pairs operators.
  *
  * All arithmetic is double precision with a strict left-to-right fold, which
  * is bit-identical to the DuckDB oracle's `list_inner_product` over
  * `DOUBLE[]` — verified empirically in the t2 gate (xq02).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product: Σ a_i * b_i, index order (native, codegen'd). */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorDot(a, b)

  /** Reference HOF formulation — same values, interpreted; used in specs to
    * cross-check the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0d),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, spelled exactly as dot/(sqrt(aa)*sqrt(bb)) so the
    * oracle can mirror the same IEEE op sequence.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
