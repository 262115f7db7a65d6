package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions for
  * custom Catalyst expressions (Spark 4 wraps Column around
  * ColumnNode; `classic.ExpressionUtils` is the supported classic-API
  * path but is package-private). Standard extension-library pattern.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
