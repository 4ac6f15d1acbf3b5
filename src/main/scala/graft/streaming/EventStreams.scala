package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2 G). The reference's pipeline is
  * batch re-ingest on a schedule (run.py); the Spark-native upgrade is a
  * continuous pipeline: file/queue source → watermarked event-time
  * transforms → sink, with the same operator semantics as the batch path
  * (G1 mirrors E13's tumbling buckets; G2 mirrors F1's exact dedup).
  *
  * These are DataFrame→DataFrame transforms usable on both batch and
  * streaming inputs — the streaming specs drive them through MemoryStream
  * and assert batch equivalence.
  */
object EventStreams {

  /** G1: watermarked tumbling-window aggregation over an event stream with
    * columns (ts: timestamp, event_type: string, value: double). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** G2: streaming exact dedup on a key, bounded by a watermark (the
    * streaming analogue of F1 — state is evictable, so it runs forever). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
