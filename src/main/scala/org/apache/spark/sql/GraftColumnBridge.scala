package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column⇄Expression converters — the
  * established pattern for Spark extension libraries (Delta, Frameless
  * et al. ship the same shim) since Spark 4 made `Column` node-based.
  * Only used by graft's custom Catalyst expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
