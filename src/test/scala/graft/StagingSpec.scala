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

  test("fuzzy match: rollup equals an exact brute-force reference (blocking included)") {
    // independent reference computed in plain Scala: corrupt each name by
    // the wire rule, pair with every clean name SHARING a trigram (the
    // blocking predicate), verify with real edit distance, keep the best
    // by (dist, name). Genuine ambiguities resolve exactly as the op
    // does — e.g. "cold anvil" minus its first char IS "old anvil".
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def grams(s: String): Set[String] =
      if (s.length >= 3) (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet else Set(s)
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cleans = parts.map(_._2).distinct.sorted
    val cleanG = cleans.map(c => c -> grams(c)).toMap
    def corrupt(k: Long, n: String): String =
      if (k % 3 == 0) n.substring(1)
      else if (k % 3 == 1) n + n.last
      else n.replace(' ', '_')
    val expect = parts.map { case (k, n) =>
      val dn = corrupt(k, n)
      val dg = grams(dn)
      val best = cleans.iterator
        .filter(c => cleanG(c).exists(dg))
        .map(c => (lev(dn, c), c)).filter(_._1 <= 2)
        .minOption
      (k, best.map(_._2).getOrElse("UNMATCHED"), best.map(_._1).getOrElse(0))
    }
    val want = expect.groupBy(_._2).view.mapValues(xs =>
      (xs.length.toLong, xs.map(_._3.toLong).sum, xs.map(_._1).sum)).toMap
    val got = Staging.fuzzyMatch(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"op rollup differs from brute force:\n got=$got\nwant=$want")
  }

  test("fuzzy match blocking: a record sharing no trigram with a clean name never pairs with it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "zzz" shares no 3-gram with any real name: candidate set must be empty
    val g = Staging.trigrams(lit("zzzqqq"))
    val cleanNames = spark.read.parquet(s"$sfDir/part.parquet")
      .select(explode(Staging.trigrams(col("p_name"))).as("g")).distinct()
      .collect().map(_.getString(0)).toSet
    val probe = Seq(1).toDF("x").select(explode(g).as("g"))
      .collect().map(_.getString(0)).toSet
    assert(probe.intersect(cleanNames).isEmpty, "probe unexpectedly shares grams")
  }

  test("quarantine routing: every row lands exactly once, precedence holds, replay is partition-pruned") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val out = Staging.quarantineRoute(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src = Tables(spark, sfDir).lineitem
      .select(col("l_quantity"), col("l_discount"), col("l_tax")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // exactly-once routing with first-match precedence, recomputed
    def reason(q: Double, d: Double, t: Double) =
      if (t > 0.06) "tax_above_cap"
      else if (d > 0.08) "discount_above_cap"
      else if (q > 45.0) "quantity_outlier" else "clean"
    val want = src.groupBy(r => reason(r._1, r._2, r._3)).view.mapValues(_.length.toLong).toMap
    assert(out == want, s"$out vs $want")
    assert(out.values.sum == src.length, "a row was dropped or double-routed")
    // a row violating tax AND discount rules must route by the FIRST rule
    assert(src.exists(r => r._3 > 0.06 && r._2 > 0.08), "precedence case absent from data")
    // replaying one violation class prunes to that reason's partition
    val root = Staging.quarantineRoot(spark)
    val replay = spark.read.parquet(s"$root/quarantine")
      .filter(col("reason") === "tax_above_cap")
    val plan = replay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("reason"),
      s"replay not partition-pruned:\n$plan")
    assert(replay.count() == out("tax_above_cap"))
  }
}
