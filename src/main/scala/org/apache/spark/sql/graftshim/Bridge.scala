package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column ↔ Expression
 * converters (Spark 4 removed the public `new Column(expr)` constructor).
 * Lives under `org.apache.spark.sql` solely to satisfy the access
 * qualifier; keep this file to these two forwarders.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
