package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ catalyst Expression
  * converters, which Spark 4 hid behind `classic.ExpressionUtils`.
  * This is the supported pattern for libraries that ship native
  * Catalyst expressions without forking Spark.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
