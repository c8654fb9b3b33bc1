package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into private[sql] API surface (Spark 4 hid the Column <->
  * Expression conversions behind classic.ExpressionUtils). Lives in the
  * org.apache.spark.sql package purely to satisfy the access modifier —
  * the standard pattern for third-party Catalyst extensions.
  */
object GraftSqlShims {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
