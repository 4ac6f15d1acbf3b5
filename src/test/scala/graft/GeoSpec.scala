package graft

import graft.functions.Kruger
import org.scalatest.funsuite.AnyFunSuite

/** Numerical specs for the Krüger SWEREF99 TM series (SURVEY C2b). */
class GeoSpec extends AnyFunSuite with SparkTestBase {

  test("kruger: central meridian maps to the false easting exactly") {
    for (lat <- Seq(55.0, 60.0, 65.0, 70.0)) {
      val (e, _) = Kruger.forwardLocal(15.0, lat)
      assert(math.abs(e - 500000.0) < 1e-6, s"lat=$lat easting=$e")
    }
  }

  test("kruger: northing is k0 x meridian arc at 60N (published magnitude)") {
    // the meridian arc length to 60°N on GRS80 is 6 654 072.82 m; SWEREF99
    // TM northing there is k0 times that (~6 651 411 m)
    val (_, n) = Kruger.forwardLocal(15.0, 60.0)
    assert(math.abs(n - 6651411.0) < 1.0, s"northing=$n")
  }

  test("kruger: forward/inverse round-trip to < 1e-9 degrees over Sweden") {
    val pts = for (i <- 0 to 10; j <- 0 to 10)
      yield (10.0 + 1.5 * i, 55.0 + 1.5 * j)
    pts.foreach { case (lon, lat) =>
      val (e, n) = Kruger.forwardLocal(lon, lat)
      val (lon2, lat2) = Kruger.inverseLocal(e, n)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($e,$n) -> ($lon2,$lat2)")
    }
  }

  test("kruger: Spark columns agree with the plain-double evaluation") {
    val rows = graft.operators.Geo.reprojectTm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val (e, n) = Kruger.forwardLocal(r.getDouble(1), r.getDouble(2))
      assert(math.abs(r.getDouble(3) - e) < 0.01, s"easting ${r.getDouble(3)} vs $e")
      assert(math.abs(r.getDouble(4) - n) < 0.01, s"northing ${r.getDouble(4)} vs $n")
    }
  }

  test("nearest join: ring certification + fallback yield the true nearest everywhere") {
    import org.apache.spark.sql.functions._
    // small cell forces sparse rings -> many probes go through the
    // fallback; the union must still equal brute force exactly
    val got = graft.operators.Geo.nearestJoin(spark, sfDir, cell = 10000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = graft.operators.Geo.nearestJoin(spark, sfDir, cell = 1e9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, "grid path diverged from brute force")
    assert(got.nonEmpty)
  }

  test("z-order buckets: every bucket spans at most a 64x64 domain cell") {
    // the top 12 z-bits pin 6 high bits of each axis, so a bucket's
    // points all fall in one 1/64-of-domain cell per axis
    val rows = graft.operators.Geo.zorderBuckets(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val (xCell, yCell) = (800001L / 64L + 1L, 1700001L / 64L + 1L)
    rows.foreach { r =>
      assert(r.getLong(2) <= xCell, s"bucket ${r.getLong(0)} x_extent ${r.getLong(2)}")
      assert(r.getLong(3) <= yCell, s"bucket ${r.getLong(0)} y_extent ${r.getLong(3)}")
    }
  }
}
