package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors (public-pattern shim: building
  * a DataFrame from a custom LogicalPlan requires Dataset.ofRows, which is
  * package-private in Spark 4's classic module). */
object GraftShims {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): classic.DataFrame =
    classic.Dataset.ofRows(spark, plan)

  /** Unload every cached state-store provider (`StateStore.unloadAll` is
    * `private[sql]`). A completed availableNow gate leaves its per-partition
    * providers — in-memory copies of the final state — in the executor's
    * provider cache until the maintenance thread eventually evicts them;
    * a run-to-completion gate should release that memory deterministically
    * (state recovery for a future run reads the checkpoint files, not the
    * cache). */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
