package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]` in Spark 4, so graft's native expressions reach it from
  * inside the `org.apache.spark.sql` package tree — the standard pattern
  * for third-party Catalyst extensions.
  */
object SparkBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
