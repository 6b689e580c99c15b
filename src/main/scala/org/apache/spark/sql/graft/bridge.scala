package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression conversions
  * (Spark 4 moved `Column` to sql-api; constructing one from a Catalyst
  * `Expression` goes through `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — hence this file lives under the spark package,
  * the standard pattern used by Spark-native libraries). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
