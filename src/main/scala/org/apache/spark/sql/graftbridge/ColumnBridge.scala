package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-package-private Expression ⇄ Column conversion (Spark
  * 4 moved the Column(Expression) constructor behind the classic API).
  * This is the supported route for registering custom Catalyst expressions
  * from library code without a SparkSessionExtensions round trip. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
