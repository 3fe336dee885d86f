package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` helpers: wraps a Catalyst [[Expression]] into a
  * user-facing [[Column]] (and back). Spark 4 removed the public
  * `new Column(expr)` constructor; this is the supported internal path
  * (org.apache.spark.sql.classic.ExpressionUtils, columnNodeSupport.scala).
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session (the runtime counterpart
    * of `SparkSessionExtensions.injectFunction`, same registry). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
}
