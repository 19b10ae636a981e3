package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 made Column↔Expression conversion `private[sql]`
 * (`classic.ExpressionUtils`). This bridge re-exports the two
 * converters for graft's native expressions that close over runtime
 * objects (e.g. a bloom sketch), where the public `call_function`
 * route would force registering a session-lifetime function per call.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
