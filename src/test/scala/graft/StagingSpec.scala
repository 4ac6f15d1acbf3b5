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

  test("geometry staging classification: match, multi-variant match, fallback, failed") {
    import spark.implicits._
    val feats = Seq(
      // s1: declared Point, dominant Point → match (the stray Polygon is
      // dropped by dominant-shape staging)
      ("s1", "Point", "Point"), ("s1", "Point", "Point"), ("s1", "Point", "Polygon"),
      // s2: declared LineString over MultiLineString data — both collapse
      // to Polyline through the ArcGIS map → match
      ("s2", "LineString", "MultiLineString"), ("s2", "LineString", "MultiLineString"),
      // s3: declared Polygon, dominant Point → FALLBACK: re-staged with
      // the explicit dominant type, keeping only dominant-shape features
      ("s3", "Polygon", "Point"), ("s3", "Polygon", "Point"), ("s3", "Polygon", "Polygon"),
      // s4: dominant type unmappable (GeometryCollection) → the explicit
      // CreateFeatureclass itself fails, nothing stages
      ("s4", "Point", "GeometryCollection"), ("s4", "Point", "GeometryCollection"),
      ("s4", "Point", "Point"))
      .toDF("source", "declared_type", "geom_type")
    val out = Staging.classifyGeomStaging(feats).collect()
      .map(r => r.getString(0) -> ((r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("s1") == (("match", 3L, 2L)), out.toString)
    assert(out("s2") == (("match", 2L, 2L)), out.toString)
    assert(out("s3") == (("fallback", 3L, 2L)), out.toString)
    assert(out("s4") == (("failed", 3L, 0L)), out.toString)
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
