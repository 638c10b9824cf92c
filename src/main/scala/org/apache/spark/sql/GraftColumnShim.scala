package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters, so graft's
  * custom Catalyst expressions (e.g. graft.expressions.DotProductFF) can be
  * exposed as user-facing `Column`s. The classic-module converters are the
  * supported internal path in Spark 4 (Column wraps a ColumnNode, not an
  * Expression); this shim only widens their visibility.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
