package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst `Expression`s and the public `Column` API.
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); the standard extension
  * pattern is a shim inside the org.apache.spark.sql package namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder in the live session's function registry
    * (SparkSession.sessionState is private[sql]).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
}
