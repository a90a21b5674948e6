package graft

import graft.expressions.{Md5Prefix60, Md5Windows60, ShingleHashes, ShingleMinHash, TokenFoldHash, VectorDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: registers graft's native expressions in the SQL
  * function registry, so `spark.sql("... vector_dot(a, b) ...")` works
  * anywhere the DataFrame API does. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done by
  * graft.Sessions) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_md5p60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "graft_md5p60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("graft_md5w60"),
      new ExpressionInfo(classOf[Md5Windows60].getName, "graft_md5w60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Windows60(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("token_fold_hash"),
      new ExpressionInfo(classOf[TokenFoldHash].getName, "token_fold_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TokenFoldHash(exprs.head)))
    // literal n/k/prefix arguments: fold to constants at registration
    e.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          if (exprs.length > 2) exprs(2).eval().toString else "")))
    e.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleMinHash(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int])))
  }
}
