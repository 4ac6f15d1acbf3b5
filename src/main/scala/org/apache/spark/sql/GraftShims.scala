package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors (public-pattern shim: building
  * a DataFrame from a custom LogicalPlan requires Dataset.ofRows, which is
  * package-private in Spark 4's classic module). */
object GraftShims {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): classic.DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
