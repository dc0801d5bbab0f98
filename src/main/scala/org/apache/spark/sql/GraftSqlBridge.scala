package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's Column ⇄ Expression converters, which are
  * `private[sql]` in the Scala signatures (the bytecode is public — Spark
  * 4 wraps classic Catalyst expressions in ColumnNodes). Living in the
  * `org.apache.spark.sql` package is the standard mechanism extension
  * libraries use to expose a custom Catalyst Expression through the public
  * Column API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
