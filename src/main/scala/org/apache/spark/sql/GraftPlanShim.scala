package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for wrapping a hand-built `LogicalPlan` into a `DataFrame` —
  * `Dataset.ofRows` is `private[sql]` in Spark 4, so this lives in the
  * `org.apache.spark.sql` package. Only used by graft's custom logical
  * operators (as-of join).
  */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
