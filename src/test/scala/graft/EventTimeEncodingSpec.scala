package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's own B6 schema-drift philosophy applied to itself: the
  * event-time read path must survive a writer-side change of the parquet
  * timestamp encoding (the r9 testdata regeneration flipped int64-nanos →
  * TIMESTAMP_NTZ micros and crashed every `ts div 1e9` site). One table,
  * three physical layouts, one invariant: [[Tables.epochSec]] produces
  * identical epoch seconds from all of them.
  */
class EventTimeEncodingSpec extends AnyFunSuite with SparkTestBase {

  private val stamps = Seq(
    "2024-01-01 00:00:00",        // exact hour boundary
    "2024-01-01 00:59:59.75",     // sub-second, just BEFORE an hour boundary
    "2024-01-01 01:00:00.25",     // sub-second, just AFTER the same boundary
    "2024-03-15 12:34:56.999999") // full micros precision

  private def layouts(): Map[String, String] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    val base = stamps.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).as("ts"))
    // session-tz TIMESTAMP (isAdjustedToUTC=true micros)
    base.write.mode("overwrite").parquet(s"$dir/tsz")
    // TIMESTAMP_NTZ micros — the driver's current pyarrow layout
    base.select(col("id"), col("ts").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // int64 nanos read back as LONG — the pre-r9 layout under
    // spark.sql.legacy.parquet.nanosAsLong=true (unix_micros keeps the
    // conversion exact; a double roundtrip would lose low bits at 1e18)
    base.select(col("id"), (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/nanos")
    Map("tsz" -> s"$dir/tsz", "ntz" -> s"$dir/ntz", "nanos" -> s"$dir/nanos")
  }

  private def secsOf(path: String): Map[Long, Long] = {
    val df = spark.read.parquet(path)
    df.select(col("id"), Tables.epochSec(df).as("sec"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("epochSec is encoding-invariant across nanos-long, timestamp and ntz layouts") {
    import spark.implicits._
    val ls = layouts()
    // the three layouts really are physically distinct
    assert(spark.read.parquet(ls("nanos")).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(spark.read.parquet(ls("ntz")).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val Seq(a, b, c) = Seq("tsz", "ntz", "nanos").map(k => secsOf(ls(k)))
    assert(a == b, "TIMESTAMP vs TIMESTAMP_NTZ epoch seconds diverge")
    assert(b == c, "TIMESTAMP_NTZ vs int64-nanos epoch seconds diverge")
    // truth: floor(extract(epoch)) — the oracle-side convention
    val want = stamps.zipWithIndex.map { case (s, i) =>
      i.toLong -> java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
    }.toMap
    assert(a == want, "epoch seconds disagree with floor(extract(epoch)) truth")
  }

  test("sub-second events floor into the correct hour bucket under every encoding") {
    import spark.implicits._
    val ls = layouts()
    ls.values.foreach { path =>
      val buckets = secsOf(path).view.mapValues(_ / 3600L).toMap
      // 00:59:59.75 stays in the 00:00 hour; 01:00:00.25 moves to the next
      assert(buckets(1L) == buckets(0L), s"$path: .75 before the boundary leaked forward")
      assert(buckets(2L) == buckets(0L) + 1L, s"$path: .25 after the boundary fell back")
    }
  }
}
