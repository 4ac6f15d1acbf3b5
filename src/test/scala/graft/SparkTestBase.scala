package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (one JVM-wide session via getOrCreate). */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
