package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. `ExpressionUtils` is private[sql]
  * in Spark 4's classic module, so custom native expressions (e.g.
  * graft.expressions.VectorDot) go through this shim — the standard pattern
  * for Spark extension libraries that ship Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Lifecycle helper for lineage-cut (checkpointed) frames: iterative
  * operators that `localCheckpoint` per round would otherwise accumulate
  * superseded checkpoint blocks for the session lifetime. The checkpointed
  * RDD sits behind the frame's `LogicalRDD` leaf; releasing it is a
  * best-effort no-op for any other plan shape.
  */
object CheckpointBridge {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.LogicalRDD

  /** Unpersists the checkpointed RDD's blocks AND, for reliable
    * checkpoints, deletes the checkpoint directory itself —
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is off by default,
    * so without this every dedupGroups round leaks ~2 frames of files.
    */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD =>
      val rdd = lr.rdd
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { dir =>
        try {
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    case _ => ()
  }

  /** Rebuild a checkpointed frame's `LogicalRDD` leaf with EXPLICIT
    * statistics. `checkpoint`/`localCheckpoint` rewrite the ORIGINAL
    * plan's statistics onto the leaf (`rewriteStatsAndConstraints`), and
    * the size-only visitor estimates every join as the PRODUCT of its
    * children's sizes — so an iterative loop that checkpoints each round
    * compounds sizeInBytes multiplicatively across rounds. By round ~15
    * the estimate is a BigInt with millions of digits and the driver
    * spins inside `SizeInBytesOnlyStatsPlanVisitor`
    * (BigInteger.multiplyToomCook3) doing no data work at all — observed
    * on the round-12 sf10 probe of the label-propagation loop, where the
    * per-round plan went quiet for >40 min with the cluster idle. Capping
    * each round's leaf at an honest measured size keeps the visitor in
    * word-sized arithmetic and planning O(1) per round.
    */
  def withStats(df: DataFrame, sizeInBytes: BigInt): DataFrame =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val session = df.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val fresh = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(session,
          Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes)),
          None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, fresh)
      case _ => df
    }
}
