package graft

import graft.operators.Staging
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for schema-drift detection (SURVEY B6). */
class StagingSpec extends AnyFunSuite with SparkTestBase {

  test("schema drift classifies ok / retyped / missing / extra per column") {
    val expected = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("gone", IntegerType)))
    val actual = StructType(Seq(
      StructField("id", LongType),          // ok
      StructField("name", IntegerType),     // retyped
      StructField("price", DoubleType),     // ok
      StructField("added", StringType)))    // extra; "gone" missing
    val rows = Staging.schemaDrift(spark, expected, actual)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(rows("id") == (("ok", "long", "long")))
    assert(rows("name") == (("retyped", "string", "integer")))
    assert(rows("price") == (("ok", "double", "double")))
    assert(rows("gone") == (("missing", "integer", "")))
    assert(rows("added") == (("extra", "", "string")))
  }

  test("drift report flags the staged v2 orders source") {
    val rows = Staging.schemaDriftReport(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("o_orderpriority") == "missing")
    assert(rows("o_ingest_src") == "extra")
    assert(rows("o_orderkey") == "retyped")
    assert(rows("o_custkey") == "ok")
  }

  test("schema drift reports duplicated column names instead of collapsing them") {
    val expected = StructType(Seq(StructField("id", LongType)))
    val actual = StructType(Seq(
      StructField("id", LongType), StructField("id", StringType)))
    val rows = Staging.schemaDrift(spark, expected, actual)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(rows.toSeq == Seq(("id", "duplicated", "long|string")))
  }
}
