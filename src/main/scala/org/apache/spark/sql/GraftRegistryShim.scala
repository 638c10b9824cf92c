package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the `private[sql]` session function registry, so graft can
  * register its Catalyst expressions as SQL functions on an *existing*
  * session (the `spark.sql.extensions` config path only applies at session
  * construction). Same visibility-widening role as GraftColumnShim.
  */
object GraftRegistryShim {
  def register(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
