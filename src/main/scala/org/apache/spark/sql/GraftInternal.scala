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

  /** DataFrame from an InternalRow RDD without the external-Row round trip
    * (`SparkSession.internalCreateDataFrame` is `private[sql]`). The rows
    * must match `schema` physically; callers that transform
    * `queryExecution.toRdd` should emit projection output directly (safe
    * for immediate narrow consumption — Spark's own operators copy where
    * buffering requires it). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

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
