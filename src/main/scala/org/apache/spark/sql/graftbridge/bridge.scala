package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 hides the Column(Expression) constructor and the converter
  * behind `private[sql]`; a library adding native expressions needs this
  * one-file bridge inside the `org.apache.spark.sql` namespace — the same
  * pattern Spark-extension libraries use. Only the two converters live
  * here; all graft logic stays in graft.* packages.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
