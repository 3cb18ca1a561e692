package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ catalyst Expression converters
  * (Spark 4 moved them behind `org.apache.spark.sql.classic`). Lives in
  * the org.apache.spark.sql package purely for access; the standard
  * pattern for libraries shipping custom Catalyst expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** If `c` is a plain literal (Spark 4 wraps `lit(...)` in a ColumnNode
    * rather than a catalyst Literal), return its value.
    */
  def literalValue(c: Column): Option[Any] = c.node match {
    case internal.Literal(v, _, _) => Some(v)
    case _ => None
  }
}
