package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge between Catalyst `Expression`s and the public `Column`
  * API. Spark 4.x moved Column to a ColumnNode abstraction; the classic
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]` — this shim (compiled into the sql package, a standard
  * pattern for Spark extensions) re-exposes exactly the two conversions the
  * engine's custom-expression tier needs (SURVEY.md §3.8 row 51).
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
