package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 moved the Column/Expression conversion behind
  * `private[sql]` (sql/classic/columnNodeSupport.scala); extension
  * libraries conventionally reach it from a sub-package of
  * org.apache.spark.sql. This is the only file in that namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
