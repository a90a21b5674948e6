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
  def release(df: DataFrame): Unit = df.queryExecution.logical.collect {
    case lr: LogicalRDD => lr
  }.foreach { lr =>
    // collect, not a root match: a checkpointed frame may carry narrow
    // wrappers (e.g. the scale-adaptive coalesce connectedComponents puts
    // on top of each round) — every checkpoint leaf under the frame is
    // this loop's to release.
    val rdd = lr.rdd
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { dir =>
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
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

  /** Cut the SQL plan WITHOUT materializing: compile `df` to its execution
    * RDD and wrap that in a fresh `LogicalRDD` leaf with explicit
    * statistics. Unlike `checkpoint`/`localCheckpoint` this runs NO job
    * and persists NO blocks — the RDD chain (including any cached-table
    * scans inside it) executes when the returned frame's consumer does.
    * The right cut for iterative loops whose per-round state has exactly
    * ONE consumer (e.g. pageRank's rank frame): re-optimization of a
    * per-round-growing plan is gone, while eager per-round checkpoint jobs
    * (measured: they DOUBLED xq60's wall at sf0.1, 1.6 -> 3.2 s in the
    * full bench, pure job floor) are not paid. A frame consumed twice
    * recomputes its round chain — use a real checkpoint when rounds have
    * multiple consumers (connectedComponents' shape).
    */
  def planCut(df: DataFrame, sizeInBytes: BigInt): DataFrame = {
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val fresh = new LogicalRDD(qe.analyzed.output, qe.toRdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
      Nil, false, None)(session,
      Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes)),
      None)
    org.apache.spark.sql.classic.Dataset.ofRows(session, fresh)
  }
}
