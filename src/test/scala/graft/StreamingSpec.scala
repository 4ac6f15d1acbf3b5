package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs (SURVEY G1/G2): the streaming transforms,
  * driven through MemoryStream → memory sink, must agree with the batch
  * path on the same rows. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 00:05:00"), "click", 1.0),
    (ts("2024-01-01 00:15:00"), "click", 2.0),
    (ts("2024-01-01 00:20:00"), "view", 3.0),
    (ts("2024-01-01 01:10:00"), "click", 4.0),
    (ts("2024-01-01 02:30:00"), "view", 5.0),
    (ts("2024-01-01 03:00:00"), "click", 6.0))

  test("G1: streaming windowed agg equals batch on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("g1_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("g1_out")
        .select("bucket_start", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
      val exp = EventStreams.windowedCounts(rows.toDF("ts", "event_type", "value"))
        .collect().map(_.toSeq).toSet
      assert(got == exp)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("G2: dropDuplicatesWithinWatermark dedups repeated keys in-stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.dedupStream(stream, Seq("event_type"))
      .writeStream.outputMode("append").format("memory").queryName("g2_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("g2_out").select("event_type").as[String].collect()
      // one row per distinct key within the watermark
      assert(got.sorted.toSeq == Seq("click", "view"))
    } finally q.stop()
  }
}
