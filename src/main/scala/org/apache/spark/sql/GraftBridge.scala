package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression converters,
  * so the engine can wrap its native Catalyst expressions
  * (graft.plans.MinHashSig) as public `Column`s without requiring the
  * SQL-function extension to be installed on the session. This is the
  * conventional pattern for third-party Spark expression libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
