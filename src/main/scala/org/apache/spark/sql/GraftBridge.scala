package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the classic converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); third-party engines
  * that ship native expressions use a one-file shim in the
  * `org.apache.spark.sql` package to reach them — this is that shim, and
  * the only file in the repo outside the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  // `AbstractDataType` is private[sql] in Spark 4; expressions outside
  // this package declare their `inputTypes` through this widener.
  def inputTypes(ts: types.DataType*): Seq[types.AbstractDataType] = ts
}
