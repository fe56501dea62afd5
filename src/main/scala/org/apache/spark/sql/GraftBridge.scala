package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> catalyst Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 hid the
  * classic constructors; extensions that define native expressions
  * still need them. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extensions module's function injections to a fresh
    * registry (for testing extension wiring without building a second
    * SparkSession — registerFunctions is private[sql]). */
  def functionRegistryOf(ext: SparkSessionExtensions => Unit): catalyst.analysis.FunctionRegistry = {
    val e = new SparkSessionExtensions
    ext(e)
    e.registerFunctions(new catalyst.analysis.SimpleFunctionRegistry)
  }
}
