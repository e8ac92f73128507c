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

  /** Eagerly convert a Column to a Catalyst expression TREE (built-ins
    * appear as UnresolvedFunction nodes the analyzer then resolves).
    * `Bridge.expression` wraps lazily in an opaque ColumnNodeExpression,
    * which is Unevaluable when returned from a FunctionRegistry builder —
    * this converter is what makes Column-composition functions registrable
    * as SQL functions.
    */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a native function on an ALREADY-RUNNING session (the
    * config-free path; for config-time injection use
    * [[graft.functions.GraftExtensions]] with `spark.sql.extensions`).
    * `sessionState` is `private[sql]`, hence this lives in the bridge.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
