package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils` (and the old
  * `Column.expr`) private[sql]; a sub-package of org.apache.spark.sql is
  * the sanctioned-by-convention interop point third-party engines use to
  * expose native Catalyst expressions through the public Column API.
  * Nothing else in the codebase lives outside the `graft` namespace.
  */
object SqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
