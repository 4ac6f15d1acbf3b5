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

  test("epsg:3010: zone constants, round-trip at both EPSG codes, zones disagree off-meridian") {
    import graft.functions.Sweref991630
    // the 16°30' central meridian maps to the 150 km false easting; k0=1
    // means northing at the meridian IS the meridian arc (6 654 072.82 m
    // to 60°N on GRS80 — vs k0x that for 3006)
    for (lat <- Seq(55.0, 60.0, 65.0)) {
      val (e, _) = Sweref991630.forwardLocal(16.5, lat)
      assert(math.abs(e - 150000.0) < 1e-6, s"lat=$lat easting=$e")
    }
    val (_, n60) = Sweref991630.forwardLocal(16.5, 60.0)
    assert(math.abs(n60 - 6654072.82) < 0.5, s"northing=$n60")
    // forward/inverse round-trip < 1e-9 deg across the zone band
    val pts = for (i <- 0 to 10; j <- 0 to 10)
      yield (12.0 + 0.9 * i, 55.0 + 1.5 * j)
    pts.foreach { case (lon, lat) =>
      val (e, n) = Sweref991630.forwardLocal(lon, lat)
      val (lon2, lat2) = Sweref991630.inverseLocal(e, n)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($e,$n) -> ($lon2,$lat2)")
    }
    // the two zones are genuinely different projections: at 14°E the
    // eastings differ by far more than the false-easting delta alone
    val (e3006, _) = Kruger.forwardLocal(14.0, 60.0)
    val (e3010, _) = Sweref991630.forwardLocal(14.0, 60.0)
    assert(math.abs((e3006 - 500000.0) - (e3010 - 150000.0)) > 10000.0,
      s"zones should disagree off-meridian: $e3006 vs $e3010")
    // and the Spark-column path agrees with plain doubles for 3010 too
    val rows = graft.operators.Geo.reprojectTm3010(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val (e, n) = Sweref991630.forwardLocal(r.getDouble(1), r.getDouble(2))
      assert(math.abs(r.getDouble(3) - e) < 0.01, s"easting ${r.getDouble(3)} vs $e")
      assert(math.abs(r.getDouble(4) - n) < 0.01, s"northing ${r.getDouble(4)} vs $n")
    }
  }

  test("nearest join: ring certification + widening yield the true nearest everywhere") {
    import org.apache.spark.sql.functions._
    // small cell forces sparse rings -> many probes need widened rings;
    // the union must still equal brute force exactly
    val got = graft.operators.Geo.nearestJoin(spark, sfDir, cell = 10000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = graft.operators.Geo.nearestJoin(spark, sfDir, cell = 1e9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, "grid path diverged from brute force")
    assert(got.nonEmpty)
  }

  test("nearest join: hostile sparse layout — rings widen, no cartesian, brute-force exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // adversarial geometry: a handful of points hundreds of cells apart,
    // probes dropped into EMPTY neighborhoods — the 3×3 ring certifies
    // nothing and the old escape hatch would have gone probes × corpus
    val ptRows = Seq((1L, 5.0, 5.0), (2L, 9000.0, 15.0), (3L, 30.0, 7000.0),
      (4L, 12000.0, 11000.0), (5L, 2.0, 9999.0), (6L, 4500.0, 4500.0))
    val pts = ptRows.toDF("o_orderkey", "x", "y")
    val probeRows = (1L to 40L).map(i =>
      (i, (i * 739L % 13001L).toDouble, (i * 1543L % 13001L).toDouble))
    val probes = probeRows.toDF("s_suppkey", "px", "py")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val got = try {
      val r = graft.operators.Geo.nearestJoinOver(spark, pts, probes, cell = 10.0)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      org.apache.spark.GraftTestShims.flushListeners(spark.sparkContext)
      r
    } finally spark.listenerManager.unregister(listener)
    // brute-force oracle in plain Scala
    val brute = probeRows.map { case (s, px, py) =>
      val (ok, d2) = ptRows.map { case (o, x, y) =>
        (o, ((x - px) * (x - px) + (y - py) * (y - py)).toLong) }
        .minBy { case (o, d) => (d, o) }
      (s, ok, d2)
    }.toSet
    assert(got == brute, "widened rings diverged from brute force")
    // every executed plan (every widening round included) stayed a hash
    // join on the cell key — no cartesian product anywhere
    import scala.jdk.CollectionConverters._
    val all = plans.asScala.toSeq
    assert(all.nonEmpty, "listener captured no plans")
    all.foreach { p =>
      assert(!p.contains("CartesianProduct"), s"cartesian in the nearest path:\n$p")
    }
  }

  test("transform select: every decision branch fires and populations reconcile") {
    val rows = graft.operators.Geo.transformSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3)))
    // exactly one decision row per source SR (the rule is a function of
    // the SR pair), and all three branches fire
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.collect { case (3010L, a, t, _) => (a, t) }.toSeq ==
      Seq(("noop", None)), "same-SR must skip projection")
    assert(rows.collect { case (4326L, a, t, _) => (a, t) }.toSeq ==
      Seq(("project", Some("WGS_1984_To_SWEREF99"))),
      "4326->3010 must pick the explicit datum transformation")
    val defaults = rows.filter(_._3.contains("defaults")).map(_._1).sorted.toSeq
    assert(defaults == Seq(2400L, 3006L, 3857L), "all other pairs use defaults")
    // populations cover the whole frame
    val total = Tables(spark, sfDir).orders.count()
    assert(rows.map(_._4).sum == total)
  }

  test("pip raycast: matches an independent ray-caster and the concave notch is real") {
    val poly = graft.operators.Geo.PipPoly
    // independent implementation: the classic float-intersect ray cast
    // (the engine uses cross-multiplied int64 — different arithmetic,
    // same predicate)
    def brute(px: Long, py: Long): Boolean = {
      val edges = poly.zip(poly.tail :+ poly.head)
      edges.count { case ((xa, ya), (xb, yb)) =>
        ya != yb && {
          val ((xlo, ylo), (xhi, yhi)) =
            if (ya < yb) ((xa, ya), (xb, yb)) else ((xb, yb), (xa, ya))
          ylo <= py && py < yhi &&
            px < xlo + (py - ylo).toDouble * (xhi - xlo) / (yhi - ylo)
        }
      } % 2 == 1
    }
    val rows = graft.operators.Geo.pipRaycast(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (x, y, inside) =>
      assert((inside == 1) == brute(x, y), s"($x,$y) engine=$inside brute=${brute(x, y)}")
    }
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0), "degenerate classification")
    // the polygon is genuinely concave: some sampled point inside the
    // convex hull (triangle A,B,C — the reflex vertex D lies inside it)
    // is OUTSIDE the polygon, i.e. the notch has population
    val Seq(a, b, c, _) = poly
    def cross(o: (Long, Long), p: (Long, Long), q: (Long, Long)): Long =
      (p._1 - o._1) * (q._2 - o._2) - (p._2 - o._2) * (q._1 - o._1)
    def inHull(px: Long, py: Long): Boolean =
      cross(a, b, (px, py)) > 0 && cross(b, c, (px, py)) > 0 && cross(c, a, (px, py)) > 0
    assert(rows.exists { case (x, y, inside) => inHull(x, y) && inside == 0 },
      "no sampled point in the notch — the concavity is untested")
  }

  test("zonal stats: first-match precedence, populations partition the corpus, rollups replay") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Geo.zonalStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(6)))
    assert(rows.map(_._1).sorted.toSeq == Seq("aoi_bbox", "aoi_polygon", "outside"),
      s"all three zones must be populated: ${rows.toSeq}")
    val total = Tables(spark, sfDir).orders.count()
    assert(rows.map(_._2).sum == total, "zones must partition the corpus")
    // independent replay: zone of every point via a scala-side first-match
    val poly = graft.operators.Geo.PipPoly
    def inside(px: Long, py: Long): Boolean = {
      val edges = poly.zip(poly.tail :+ poly.head)
      edges.count { case ((xa, ya), (xb, yb)) =>
        ya != yb && {
          val ((xlo, ylo), (xhi, yhi)) =
            if (ya < yb) ((xa, ya), (xb, yb)) else ((xb, yb), (xa, ya))
          ylo <= py && py < yhi &&
            (px - xlo) * (yhi - ylo) < (xhi - xlo) * (py - ylo)
        }
      } % 2 == 1
    }
    val keys = Tables(spark, sfDir).orders.select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val brute = keys.map { k =>
      val x = 150000L + (k * 7919L) % 800001L
      val y = 6050000L + (k * 104729L) % 1700001L
      val z = if (inside(x, y)) "aoi_polygon"
        else if (x >= 400000L && x <= 600000L && y >= 6500000L && y <= 7000000L) "aoi_bbox"
        else "outside"
      (z, k % 1000L)
    }
    val bruteAgg = brute.groupBy(_._1).map { case (z, g) =>
      (z, g.length.toLong, g.map(_._2).sum) }.toSeq.sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq == bruteAgg, "zone rollups diverged from the replay")
    // precedence is real: some bbox-contained point sits inside the
    // polygon and must have been claimed by the polygon zone
    assert(keys.exists { k =>
      val x = 150000L + (k * 7919L) % 800001L
      val y = 6050000L + (k * 104729L) % 1700001L
      inside(x, y) && x >= 400000L && x <= 600000L && y >= 6500000L && y <= 7000000L
    }, "no overlap between polygon and bbox — precedence untested")
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

  test("dbscan: planted blob/chain/border/loner replay against the naive all-pairs definition") {
    import spark.implicits._
    val eps = 1000L; val minPts = 2L
    val pts: Seq[(Long, Long, Long)] =
      (0L to 6L).map(i => (i, i * 100L, 0L)) ++          // dense blob (all core)
        Seq((50L, 1599L, 0L)) ++                         // border of the blob
        (0L to 9L).map(i => (100L + i, 40000L + i * 900L, 0L)) ++ // 10-hop chain
        Seq((99L, 999999L, 999999L))                     // loner
    val got = graft.operators.Geo.dbscanOf(pts.toDF("id", "xi", "yi"), eps, minPts)
      .collect().map(r => (r.getLong(0), r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSeq.sortBy(_._1)
    // naive replay: all-pairs distances, core threshold, reachability
    // over cores (transitive closure), min-adjacent border rule
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && d2(p, q) <= eps * eps).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // closure over core adjacency
    var comp = core.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n)) {
        val m = math.min(comp(c), comp(n))
        if (comp(c) != m) { comp += c -> m; changed = true }
        if (comp(n) != m) { comp += n -> m; changed = true }
      }
    }
    val want = pts.map { p =>
      if (core(p._1)) (p._1, "core", Some(comp(p._1)))
      else {
        val coreNb = nbrs(p._1).filter(core)
        if (coreNb.nonEmpty) (p._1, "border", Some(coreNb.map(comp).min))
        else (p._1, "noise", None)
      }
    }.sortBy(_._1)
    assert(got == want, s"dbscan replay diverged:\n$got\nvs\n$want")
    // structure: one blob cluster, the border hangs off it, the chain is
    // ONE cluster despite spanning 9 grid cells (multi-hop CC), loner noise
    assert(got.filter(t => t._1 <= 6L).forall(t => t._2 == "core" && t._3.contains(0L)))
    assert(got.find(_._1 == 50L).exists(t => t._2 == "border" && t._3.contains(0L)))
    val chain = got.filter(t => t._1 >= 100L && t._1 < 110L)
    assert(chain.count(_._2 == "core") == 8 && chain.count(_._2 == "border") == 2,
      s"chain roles wrong: $chain")
    assert(chain.flatMap(_._3).distinct == Seq(101L), "chain fragmented") // 101 = min CORE id (ends are borders)
    assert(got.find(_._1 == 99L).exists(t => t._2 == "noise" && t._3.isEmpty))
  }

  test("declared-CRS parse: every reference branch and reconcile class on handwritten GeoJSON") {
    import spark.implicits._
    def fc(crs: String, x: Long, y: Long): String = {
      val c = if (crs.isEmpty) ""
        else s"""\"crs\":{\"type\":\"name\",\"properties\":$crs},"""
      s"""{\"type\":\"FeatureCollection\",$c\"features\":[{\"type\":\"Feature\",\"geometry\":{\"type\":\"Point\",\"coordinates\":[$x,$y]}}]}"""
    }
    def nm(n: String) = s"""{\"name\":\"$n\"}"""
    val sweref = (500000L, 6500000L)   // inside the SWEREF99 TM box
    val deg = (15L, 60L)               // inside the degrees box
    val out = (5000000L, 5000000L)     // inside neither
    val docs = Seq(
      // (doc_id, source, doc) — one source per case
      (1L, 0, fc(nm("EPSG:3006"), sweref._1, sweref._2)),          // consistent
      (2L, 1, fc(nm("EPSG:4326"), sweref._1, sweref._2)),          // mismatch
      (3L, 2, fc(nm("urn:ogc:def:crs:EPSG::3006"), sweref._1, sweref._2)), // parse fail -> undeclared
      (4L, 3, fc("", deg._1, deg._2)),                             // absent crs -> 4326 default
      (5L, 4, fc(nm("CRS84"), deg._1, deg._2)),                    // CRS84 upper
      (6L, 5, fc(nm("crs84"), deg._1, deg._2)),                    // CRS84 lower (upper() path)
      (7L, 6, fc(nm("EPSG:3006 (SWEREF99 TM)"), sweref._1, sweref._2)), // whitespace-split path
      (8L, 7, fc("{}", deg._1, deg._2)),                           // crs without name -> undeclared
      (9L, 8, fc(nm("EPSG:"), deg._1, deg._2)),                    // empty tail -> undeclared
      (10L, 9, fc(nm("WGS84"), deg._1, deg._2)),                   // unknown form -> undeclared
      (11L, 10, fc(nm("EPSG:3006"), out._1, out._2)),              // uninferable coords win
      (12L, 11, fc(nm("EPSG: 3006"), sweref._1, sweref._2)),       // leading space after the colon
      // reference truthiness ladder edges (sr_utils.py:153-159)
      (13L, 12, """{"type":"FeatureCollection","features":["""),   // corrupt doc -> None, not dict.get
      (14L, 13, """[{"x":1}]"""),                                  // non-dict doc -> None
      (15L, 14, """{"type":"FeatureCollection","crs":null,"features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[15,60]}}]}"""), // null crs is falsy -> 4326
      (16L, 15, """{"type":"FeatureCollection","crs":{},"features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[15,60]}}]}""")    // empty crs is falsy -> 4326
    ).toDF("doc_id", "source", "doc")
    val got = graft.operators.Geo.srDeclaredOf(docs).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(0) == ((3006, 3006, "consistent")))
    assert(got(1) == ((4326, 3006, "mismatch")))
    assert(got(2) == ((0, 3006, "undeclared")), "urn EPSG:: tail must fail int(), not fall through")
    assert(got(3) == ((4326, 4326, "consistent")), "absent crs defaults to WGS84")
    assert(got(4) == ((4326, 4326, "consistent")))
    assert(got(5) == ((4326, 4326, "consistent")), "CRS84 match is case-insensitive")
    assert(got(6) == ((3006, 3006, "consistent")), "code is the first whitespace token after EPSG:")
    assert(got(7) == ((0, 4326, "undeclared")), "crs without a name is undeclared")
    assert(got(8) == ((0, 4326, "undeclared")))
    assert(got(9) == ((0, 4326, "undeclared")))
    assert(got(10) == ((3006, 0, "uninferable")), "uninferable coordinates outrank the declared code")
    assert(got(11) == ((3006, 3006, "consistent")),
      "Python .split() discards leading whitespace: 'EPSG: 3006' parses to 3006")
    assert(got(12) == ((0, 0, "uninferable")),
      "a corrupt doc is None (undeclared), never the WGS84 default")
    assert(got(13) == ((0, 0, "uninferable")), "a non-dict doc is None")
    assert(got(14) == ((4326, 4326, "consistent")), "crs:null is falsy -> WGS84 default")
    assert(got(15) == ((4326, 4326, "consistent")), "crs:{} is falsy -> WGS84 default")
  }
}
