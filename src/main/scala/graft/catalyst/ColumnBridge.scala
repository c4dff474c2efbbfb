package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so the two one-line
  * forwarders live in the org.apache.spark.sql package (standard extension
  * technique for libraries adding native expressions). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
