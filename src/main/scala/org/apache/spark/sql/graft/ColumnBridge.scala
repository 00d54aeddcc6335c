package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for the graft engine's native
  * expressions (Spark 4.x wraps Columns around ColumnNode, so lifting a
  * custom Expression needs the classic converter, which is private[sql] —
  * hence this file lives under org.apache.spark.sql).
  */
object ColumnBridge {
  def lift(e: Expression): Column = ExpressionUtils.column(e)
  def unwrap(c: Column): Expression = ExpressionUtils.expression(c)
}
