package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the supported
  * way to expose a custom Catalyst [[Expression]] through the public Column
  * API in Spark 4 (Column itself holds a ColumnNode, not an Expression).
  */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
