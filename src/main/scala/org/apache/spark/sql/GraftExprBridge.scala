package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters (Spark
  * 4 wraps Column around ColumnNode; classic.ExpressionUtils does the
  * conversion). Standard extension-library shim: living in
  * `org.apache.spark.sql` grants the access; nothing else belongs here.
  */
object GraftExprBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The original SQL text of a Column built with `expr("...")` /
    * `selectExpr` — i.e. whose node is a [[internal.SqlExpression]].
    * None for Columns built through the DSL (their nodes render
    * debug strings, not parseable SQL).
    */
  def sqlText(c: Column): Option[String] = c.node match {
    case internal.SqlExpression(sql, _) => Some(sql)
    case _ => None
  }

  /** Register a function into a LIVE session's registry (the
    * `spark.sql.extensions` route only applies at session build).
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Drain a SparkSessionExtensions' injected functions into a registry
    * (`registerFunctions` is private[sql]) — lets tests exercise the
    * `spark.sql.extensions` wiring without building a new session.
    */
  def applyExtensionFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
