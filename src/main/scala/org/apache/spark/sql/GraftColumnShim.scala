package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building `Column`s from catalyst `Expression`s — the
  * conversion utilities are `private[sql]` in Spark 4, so this lives in the
  * `org.apache.spark.sql` package. Only used by `graft.plans.native`.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
