package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Load + monitoring (SURVEY §2 D). Re-expresses op-etl's SDE load
  * (/root/reference/etl/load_sde.py) and pipeline monitoring
  * (/root/reference/etl/monitoring.py).
  */
object LoadOps {

  /** D1: truncate-and-load (load_sde.py:92 load_to_sde: TruncateTable +
    * Append) → Spark overwrite-mode write. Run the cycle twice to prove
    * idempotence, read the target back and reconcile counts. */
  def truncateLoad(spark: SparkSession, dir: String): DataFrame = {
    val out = "/root/repo/target/graft_sde/orders_f"
    val src = Tables(spark, dir).orders.filter(col("o_orderstatus") === "F")
    src.write.mode("overwrite").parquet(out) // initial load
    src.write.mode("overwrite").parquet(out) // truncate-and-load cycle
    spark.read.parquet(out)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("loaded_rows"),
        round(sum(col("o_totalprice")), 2).as("loaded_value"))
      .orderBy(col("o_orderpriority"))
  }

  /** D2: per-source run metrics (monitoring.py SourceMetrics /
    * PipelineMonitor.get_summary): success counts, rates, durations,
    * retry totals — events as the telemetry stream, `props` parsed with a
    * native regexp (no JSON UDF). */
  def sourceSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .withColumn("retries",
        regexp_extract(col("props"), "k\":\\s*([0-9]+)", 1).cast("long"))
      .groupBy(col("event_type").as("source"))
      .agg(
        count(lit(1)).as("n_runs"),
        sum(when(col("value") >= 1.0, 1).otherwise(0)).cast("long").as("n_success"),
        round(sum(when(col("value") >= 1.0, 1).otherwise(0)).cast("double") / count(lit(1)), 4).as("success_rate"),
        round(avg(col("value")), 2).as("avg_duration"),
        round(sum(col("value")), 2).as("total_duration"),
        sum(col("retries")).cast("long").as("total_retries"))
      .orderBy(col("source"))
  }

  /** D3: error-pattern rollup (monitoring.py error_type tracking +
    * log_summary's top-error report): classify, count, rank. */
  def errorPatterns(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.filter(col("event_type") === "error")
      .withColumn("error_class",
        when(col("value") < 1.0, "timeout")
          .when(col("value") < 10.0, "http_4xx")
          .when(col("value") < 100.0, "http_5xx")
          .otherwise("transfer_limit"))
      .groupBy(col("error_class"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_magnitude"))
      .orderBy(col("n").desc, col("error_class"))
  }
}
