package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ catalyst Expression
  * conversion (Spark 4 moved Column onto ColumnNode; `ExpressionUtils` is
  * the supported internal shim). Lives under `org.apache.spark.sql` so the
  * `private[sql]` members are visible.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
