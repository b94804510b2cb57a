package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`
  * (columnNodeSupport.scala). Extension libraries that define native
  * Catalyst expressions need exactly these two hops; placing the
  * bridge inside the `org.apache.spark.sql` package is the standard
  * technique (same as spark-packages like sedona/delta do).
  */
object GraftBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Apply the function injections of a SparkSessionExtensions to a
    * registry (what session construction does with
    * `spark.sql.extensions`; `registerFunctions` is `private[sql]`).
    * Test seam for extension classes. */
  def applyInjectedFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** Register a function builder into an EXISTING session's registry
    * (`sessionState` is `private[sql]`; new sessions should prefer
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
