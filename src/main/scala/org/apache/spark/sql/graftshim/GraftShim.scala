package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x). Custom
  * Catalyst expressions need it to surface as user-facing Columns; the
  * conversion was public API in Spark ≤3 (`Column(expr)` / `col.expr`)
  * and the classic path is still the supported execution model — this
  * shim is the minimal access point, kept in one place.
  */
object GraftShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
