package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin bridge into private[sql] APIs (Spark 4 moved Column<->Expression
  * conversion behind org.apache.spark.sql.classic.ExpressionUtils). Mirrors
  * the technique the reference uses in its own SparkSQLBridge
  * (reference: spark/spark-common/src/main/scala/org/apache/spark/sql/SparkSQLBridge.scala:34-74).
  */
object GraftSQLBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
