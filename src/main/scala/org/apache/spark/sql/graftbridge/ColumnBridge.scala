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
