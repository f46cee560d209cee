package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ catalyst Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), so the
  * library can expose native codegen expressions through the public
  * `Column` API. Lives in a subpackage of `org.apache.spark.sql` for
  * access; contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
