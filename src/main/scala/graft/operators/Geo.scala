package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geoprocessing (SURVEY §2 C). Re-expresses op-etl's geoprocessing +
  * spatial-reference enforcement (/root/reference/etl/process.py,
  * sr_utils.py) over planar (x, y) columns.
  *
  * The testdata has no geometry, so coordinates are derived
  * deterministically from keys (identical arithmetic in the DuckDB
  * oracle). All ops are per-row predicates/expressions: shuffle-free,
  * codegen'd, and bbox filters are partition-prunable at scale.
  */
object Geo {

  /** Synthetic SWEREF99-TM-like planar meters (EPSG:3006 magnitudes). */
  private def synthXY(df: DataFrame): DataFrame = df
    .withColumn("x", (lit(150000L) + (col("o_orderkey") * 7919L) % 800001L).cast("double"))
    .withColumn("y", (lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L).cast("double"))

  /** Synthetic Sweden-range lon/lat (WGS84 degrees). */
  private def synthLonLat(df: DataFrame): DataFrame = df
    .withColumn("lon", lit(10.0) + ((col("o_orderkey") * 7919L) % 1500001L) / 100000.0)
    .withColumn("lat", lit(55.0) + ((col("o_orderkey") * 104729L) % 1500001L) / 100000.0)

  // AOI used by clip/envelope/sanity (process.py clips to a municipality
  // boundary; modeled as its bounding box).
  private val (bxmin, bymin, bxmax, bymax) = (400000.0, 6500000.0, 600000.0, 7000000.0)

  private def inBox(x: Column, y: Column, x0: Double, y0: Double, x1: Double, y1: Double): Column =
    x >= x0 && x <= x1 && y >= y0 && y <= y1

  /** C1: clip features to the AOI bbox (process.py:115 arcpy.analysis.Clip).
    * A pure range predicate — pushes to the scan, prunes partitions. */
  def bboxClip(spark: SparkSession, dir: String): DataFrame =
    synthXY(Tables(spark, dir).orders)
      .filter(inBox(col("x"), col("y"), bxmin, bymin, bxmax, bymax))
      .select(col("o_orderkey"), col("x"), col("y"))
      .orderBy(col("o_orderkey"))

  /** C2: reproject WGS84 lon/lat to planar meters (process.py:137
    * arcpy.management.Project). Spherical-Mercator forward as native trig
    * columns — whole-stage codegen, no UDF. */
  def reproject(spark: SparkSession, dir: String): DataFrame = {
    val r = 6378137.0
    synthLonLat(Tables(spark, dir).orders)
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("lon"), col("lat"),
        round(radians(col("lon")) * r, 2).as("mx"),
        round(log(tan(lit(Math.PI / 4) + radians(col("lat")) / 2)) * r, 2).as("my"))
      .orderBy(col("o_orderkey"))
  }

  /** C2b: TRUE reprojection to the SWEREF99 TM family via the Krüger
    * transverse-Mercator series (process.py:92 targets EPSG:3006/3010 —
    * a TM projection, not Mercator; C2 keeps the spherical form for
    * contrast). Zone-parameterized: EPSG:3006 (the national grid, the
    * default here) and EPSG:3010 (SWEREF99 16 30 — the reference's
    * production `target_srid`, config.yaml; process.py:93/:129/:144)
    * differ only in (central meridian, k0, false easting). Per-row pure
    * arithmetic, codegen'd; the round-trip spec (GeoSpec) inverts the
    * series to < 1e-9° at both EPSG codes. */
  def reprojectTm(spark: SparkSession, dir: String,
      proj: graft.functions.TmProjection = graft.functions.Kruger): DataFrame = {
    val (e, n) = proj.forward(col("lon"), col("lat"))
    synthLonLat(Tables(spark, dir).orders)
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("lon"), col("lat"),
        round(e, 2).as("easting"), round(n, 2).as("northing"))
      .orderBy(col("o_orderkey"))
  }

  /** C2c: the EPSG:3010 production target (see [[reprojectTm]]). */
  def reprojectTm3010(spark: SparkSession, dir: String): DataFrame =
    reprojectTm(spark, dir, graft.functions.Sweref991630)

  /** C2d: datum-transformation SELECTION (process.py:141-148) — the
    * reference's reprojection DECISION rule, distinct from the math C2b/
    * C2c implement: same-SR features skip projection entirely; the
    * 4326→3010 pair projects with the EXPLICIT `WGS_1984_To_SWEREF99`
    * datum transformation; every other pair projects under engine
    * defaults. Replayed over a per-feature frame whose source SR is
    * derived deterministically from the key (five common codes incl. the
    * target itself), rolled up per (source SR, decision) so the output
    * certifies each branch's population. Pure case-when on a scan + one
    * map-side-combined hash agg — shuffle is |distinct decisions| rows at
    * any scale; full oracle. */
  def transformSelect(spark: SparkSession, dir: String, targetWkid: Int = 3010): DataFrame = {
    val current = (col("o_orderkey") % 5)
    val wkid = when(current === 0, 3010).when(current === 1, 4326)
      .when(current === 2, 3006).when(current === 3, 2400).otherwise(3857)
    val df = Tables(spark, dir).orders
      .select(col("o_orderkey"))
      .withColumn("current_wkid", wkid.cast("long"))
    val needs = col("current_wkid") =!= targetWkid
    val explicitTf = col("current_wkid") === 4326 && lit(targetWkid) === 3010
    df.withColumn("action", when(!needs, lit("noop")).otherwise(lit("project")))
      .withColumn("transformation",
        when(needs && explicitTf, lit("WGS_1984_To_SWEREF99"))
          .when(needs, lit("defaults"))
          .otherwise(lit(null).cast("string")))
      .groupBy(col("current_wkid"), col("action"), col("transformation"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("first_key"))
      .orderBy(col("current_wkid"), col("action"))
  }

  /** C13's AOI: a CONCAVE simple polygon (a "dart" — reflex vertex
    * last), in integer planar meters. Shared with the oracle SQL
    * generator and the spec so all three replay one boundary. */
  val PipPoly: Seq[(Long, Long)] = Seq(
    (150000L, 6100000L), (950000L, 6200000L),
    (600000L, 7700000L), (550000L, 6500000L))

  /** The division-free ray-cast parity term for one point against
    * [[PipPoly]]: odd crossing count = inside. Each non-horizontal edge
    * is normalized lower-y-first, crossed iff `ylo <= py < yhi` and the
    * point sits strictly left of the edge at the scanline — the
    * left-of test cross-multiplied so it stays in exact int64
    * arithmetic (|Δcoord| ≤ 1.7e6 ⇒ products ≤ 3e12, no overflow). */
  def pipInside(px: Column, py: Column): Column = {
    val edges = PipPoly.zip(PipPoly.tail :+ PipPoly.head)
    val crossings = edges.collect { case ((xa, ya), (xb, yb)) if ya != yb =>
      val ((xlo, ylo), (xhi, yhi)) = if (ya < yb) ((xa, ya), (xb, yb)) else ((xb, yb), (xa, ya))
      when(lit(ylo) <= py && py < lit(yhi) &&
        (px - lit(xlo)) * lit(yhi - ylo) < lit(xhi - xlo) * (py - lit(ylo)),
        1L).otherwise(0L)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** C13: point-in-polygon by RAY CASTING against an arbitrary simple
    * (here concave) polygon — the general form of the reference's Clip
    * to a boundary feature class (process.py:115; C7 handles only
    * CONVEX AOIs via a half-plane conjunction, which cannot express a
    * reflex vertex). Parity of scanline crossings, every comparison in
    * exact int64 ([[pipInside]]), so Spark and DuckDB agree bit-for-bit
    * with zero float tolerance.
    *
    * Scale shape: per-row codegen'd arithmetic over the scan — zero
    * shuffle, and the polygon's bbox range predicate would push to the
    * reader as a pre-filter for real layouts (C1's contract). At 100 TB
    * clip-to-AOI stays a map-only stage regardless of polygon shape. */
  def pipRaycast(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir).orders
      .filter(col("o_orderkey") % 7 === 0)
      .withColumn("xi", lit(150000L) + (col("o_orderkey") * 7919L) % 800001L)
      .withColumn("yi", lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L)
    df.select(col("o_orderkey"), col("xi"), col("yi"),
        pipInside(col("xi"), col("yi")).cast("int").as("inside"))
      .orderBy(col("o_orderkey"))
  }

  /** C14: ZONAL STATISTICS (arcpy Zonal Statistics / Summarize Within —
    * the reporting geoprocessing verb next to Clip): every feature
    * assigns to exactly one zone by FIRST-MATCH over an ordered zone
    * list — the concave C13 polygon (ray-cast containment), then the
    * AOI bbox, then a residual "outside" zone — and each zone reports
    * count, extent, and a value rollup. First-match is the D12 elif
    * precedent; containment arithmetic is [[pipInside]] / [[inBox]]
    * reused verbatim, all exact int64.
    *
    * Scale shape: zone assignment is a per-row codegen'd case-when over
    * the scan (zero joins — zones are expressions, not a table to
    * shuffle); ONE map-side-combined hash agg emits |zones| rows. At
    * 100 TB zonal reporting is a single pass regardless of zone count. */
  def zonalStats(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir).orders
      .withColumn("xi", lit(150000L) + (col("o_orderkey") * 7919L) % 800001L)
      .withColumn("yi", lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L)
      .withColumn("v", (col("o_orderkey") % 1000L))
    val zone = when(pipInside(col("xi"), col("yi")), lit("aoi_polygon"))
      .when(inBox(col("xi").cast("double"), col("yi").cast("double"),
        bxmin, bymin, bxmax, bymax), lit("aoi_bbox"))
      .otherwise(lit("outside"))
    df.withColumn("zone", zone)
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_features"),
        min(col("xi")).as("min_x"), max(col("xi")).as("max_x"),
        min(col("yi")).as("min_y"), max(col("yi")).as("max_y"),
        sum(col("v")).as("sum_value"),
        min(col("o_orderkey")).as("first_key"))
      .orderBy(col("zone"))
  }

  /** C3: coordinate-magnitude validation (sr_utils.py:15
    * validate_coordinates_magnitude; :39/:49 per-SR bounds). */
  def srValidate(spark: SparkSession, dir: String): DataFrame = {
    val df = synthXY(Tables(spark, dir).orders)
      .withColumn("glon", ((col("o_orderkey") * 31L) % 400L).cast("double") - 200.0)
      .withColumn("glat", ((col("o_orderkey") * 37L) % 200L).cast("double") - 100.0)
    val validSweref = inBox(col("x"), col("y"), 200000, 6100000, 900000, 7700000)
    val validWgs = inBox(col("glon"), col("glat"), -180, -90, 180, 90)
    val validSweden = inBox(col("glon"), col("glat"), 10, 55, 25, 70)
    df.agg(
      sum(when(validSweref, 1).otherwise(0)).cast("long").as("n_valid_sweref"),
      sum(when(!validSweref, 1).otherwise(0)).cast("long").as("n_invalid_sweref"),
      sum(when(validWgs, 1).otherwise(0)).cast("long").as("n_valid_wgs84"),
      sum(when(!validWgs, 1).otherwise(0)).cast("long").as("n_invalid_wgs84"),
      sum(when(validSweden, 1).otherwise(0)).cast("long").as("n_sweden_wgs84"))
  }

  /** C4: response-envelope vs requested-bbox tolerance check
    * (sr_utils.py:62 validate_bbox_vs_envelope, 10% tolerance). */
  def envelopeCheck(spark: SparkSession, dir: String): DataFrame = {
    val tol = 0.1
    val xw = (bxmax - bxmin) * tol
    val yw = (bymax - bymin) * tol
    synthXY(Tables(spark, dir).orders)
      .filter(inBox(col("x"), col("y"), bxmin, bymin, bxmax, bymax))
      .groupBy(col("o_orderstatus"))
      .agg(min(col("x")).as("xmin"), min(col("y")).as("ymin"),
        max(col("x")).as("xmax"), max(col("y")).as("ymax"))
      .withColumn("envelope_ok",
        (abs(col("xmin") - bxmin) <= xw && abs(col("ymin") - bymin) <= yw &&
          abs(col("xmax") - bxmax) <= xw && abs(col("ymax") - bymax) <= yw).cast("int"))
      .orderBy(col("o_orderstatus"))
  }

  /** C5: small-bbox vs large-bbox feature-count sanity
    * (sr_utils.py:118 validate_feature_count_sanity, min_ratio=0.1).
    * Both counts in one conditional-aggregation pass. */
  def countSanity(spark: SparkSession, dir: String): DataFrame = {
    val df = synthXY(Tables(spark, dir).orders)
    val inSmall = inBox(col("x"), col("y"), 450000, 6600000, 550000, 6900000)
    val inLarge = inBox(col("x"), col("y"), bxmin, bymin, bxmax, bymax)
    df.agg(
        sum(when(inSmall, 1).otherwise(0)).cast("long").as("small_n"),
        sum(when(inLarge, 1).otherwise(0)).cast("long").as("large_n"))
      .withColumn("sane", (col("small_n") <= col("large_n")).cast("int"))
      .withColumn("ratio_ok",
        (col("small_n").cast("double") / col("large_n") >= 0.1).cast("int"))
  }

  /** C7: clip to a convex polygon AOI (process.py:115 Clip takes an
    * arbitrary boundary feature class, not a bbox). Convex polygon =
    * conjunction of per-edge half-plane tests — still a pure per-row
    * predicate: codegen'd, shuffle-free, and each conjunct can prune. */
  def polygonClip(spark: SparkSession, dir: String): DataFrame = {
    // hexagonal AOI around the synthetic Sweden extent
    val (cx, cy, r) = (500000.0, 6750000.0, 220000.0)
    val verts = (0 until 6).map { i =>
      val a = math.Pi / 3 * i
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    val inside = verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % 6)
      // CCW polygon: point is inside iff left of every edge
      (lit(x2 - x1) * (col("y") - y1) - lit(y2 - y1) * (col("x") - x1)) >= 0.0
    }.reduce(_ && _)
    synthXY(Tables(spark, dir).orders)
      .filter(inside)
      .select(col("o_orderkey"), col("x"), col("y"))
      .orderBy(col("o_orderkey"))
  }

  /** Polygon vertices for the C7 oracle (shared so the SQL embeds the
    * exact same double literals). */
  def hexVerts: Seq[(Double, Double)] = (0 until 6).map { i =>
    val a = math.Pi / 3 * i
    (500000.0 + 220000.0 * math.cos(a), 6750000.0 + 220000.0 * math.sin(a))
  }

  /** C8: WKT round-trip — serialize synthetic integer-coordinate points to
    * WKT (stage_files.py moves features as text formats: GeoJSON/GML/WKT)
    * and parse them back with native regexps. */
  def wktRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .withColumn("xi", lit(150000L) + (col("o_orderkey") * 7919L) % 800001L)
      .withColumn("yi", lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L)
      .withColumn("wkt", concat(lit("POINT ("), col("xi").cast("string"),
        lit(" "), col("yi").cast("string"), lit(")")))
      .select(col("o_orderkey"), col("wkt"),
        regexp_extract(col("wkt"), "POINT \\(([0-9]+) ([0-9]+)\\)", 1)
          .cast("double").as("px"),
        regexp_extract(col("wkt"), "POINT \\(([0-9]+) ([0-9]+)\\)", 2)
          .cast("double").as("py"))
      .orderBy(col("o_orderkey"))
  }

  /** C9: geometry measures — area (shoelace) and perimeter of per-row
    * synthetic triangles (the reference's staged feature classes carry
    * computed geometry attributes; arcpy exposes them as Shape_Area /
    * Shape_Length). Pure per-row arithmetic over three derived vertices. */
  def geomMeasures(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir).orders
      .withColumn("x1", ((col("o_orderkey") * 7919L) % 10000L).cast("double"))
      .withColumn("y1", ((col("o_orderkey") * 104729L) % 10000L).cast("double"))
      .withColumn("x2", ((col("o_orderkey") * 131L) % 10000L).cast("double"))
      .withColumn("y2", ((col("o_orderkey") * 151L) % 10000L).cast("double"))
      .withColumn("x3", ((col("o_orderkey") * 173L) % 10000L).cast("double"))
      .withColumn("y3", ((col("o_orderkey") * 193L) % 10000L).cast("double"))
    def d(ax: Column, ay: Column, bx: Column, by: Column): Column =
      sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay))
    df.withColumn("area", round(abs(
          (col("x2") - col("x1")) * (col("y3") - col("y1")) -
            (col("x3") - col("x1")) * (col("y2") - col("y1"))) / 2.0, 4))
      .withColumn("perimeter", round(
        d(col("x1"), col("y1"), col("x2"), col("y2")) +
          d(col("x2"), col("y2"), col("x3"), col("y3")) +
          d(col("x3"), col("y3"), col("x1"), col("y1")), 4))
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("area"), col("perimeter"))
      .orderBy(col("o_orderkey"))
  }

  /** Morton bit-spread masks (16-bit coordinate → even bit positions),
    * shared by the Column builder and the oracle SQL emitter. */
  private val spreadMasks: Seq[(Int, Long)] =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  private def spreadBits(c: Column): Column =
    spreadMasks.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (v, (sh, m)) =>
      (v.bitwiseOR(shiftleft(v, sh))).bitwiseAND(lit(m))
    }

  private def spreadBitsSql(v0: String): String =
    spreadMasks.foldLeft(s"($v0 & 65535)") { case (v, (sh, m)) =>
      s"(($v | ($v << $sh)) & $m)"
    }

  /** C11: Z-order (Morton) locality buckets — the LAKEHOUSE LAYOUT move
    * for spatial data: interleave the 16-bit grid coordinates so that
    * sorting/partitioning by one integer key keeps 2-D neighbors
    * together; range scans and bbox queries then touch few buckets
    * instead of striding the whole table. The top 12 z-bits = a
    * 64×64 cell of the domain, so every bucket's extent is provably
    * ≤ 1/64 of each axis (spec-asserted). Pure integer bit arithmetic
    * on both engines → exact oracle. */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val df = synthXY(Tables(spark, dir).orders)
    // exact 16-bit grid normalization (integer div — no fp)
    val xi = expr("(CAST(x AS BIGINT) - 150000) * 65536 DIV 800001")
    val yi = expr("(CAST(y AS BIGINT) - 6050000) * 65536 DIV 1700001")
    val z = spreadBits(xi).bitwiseOR(shiftleft(spreadBits(yi), 1))
    df.withColumn("z", z)
      .withColumn("bucket", shiftrightunsigned(col("z"), 20))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (max(col("x")) - min(col("x"))).cast("long").as("x_extent"),
        (max(col("y")) - min(col("y"))).cast("long").as("y_extent"))
      .orderBy(col("bucket"))
  }

  /** C12: grid hotspot detection — the reference platform's flagship
    * spatial statistic (arcpy Hot Spot Analysis / Getis-Ord Gi*) at
    * engine level: find cells whose NEIGHBORHOOD is anomalously dense,
    * not just dense cells (one packed cell in a sparse area and a
    * uniformly busy region must score differently). Features aggregate
    * to grid-cell counts first (the C10/C11 grid trick — all later math
    * runs on the CELL table, thousands of rows from billions of
    * features), each cell then meets exactly its 3×3 ring through an
    * explode of the 9 offsets + one join on the neighbor cell id, and
    * the Gi*-style z-score compares the ring sum against its expectation
    * under the global cell-count distribution:
    *   z = (ringSum − w·mean) / (sd · sqrt(w·(N−w)/(N−1)))
    * with w = ring size (≤9), over the OCCUPIED cells (the standard
    * engine-level simplification; empty-cell inclusion would only shift
    * mean/sd). Counts and ring sums are exact integers; mean/sd/z are
    * computed with one fixed expression order so the rounded score is
    * cross-engine stable. */
  def gridHotspots(spark: SparkSession, dir: String, cell: Double = 100000.0,
      hotZ: Double = 2.0): DataFrame =
    gridHotspotsOf(synthXY(Tables(spark, dir).orders), cell, hotZ)

  /** C12 core over an explicit (x, y) frame — split out so the
    * adversarial spec can drive hostile layouts (single packed cell,
    * uniform background) through the same cell pipeline. */
  def gridHotspotsOf(df: DataFrame, cell: Double, hotZ: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .withColumn("cx", floor(col("x") / cell).cast("long"))
      .withColumn("cy", floor(col("y") / cell).cast("long"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
      // cell table: thousands of rows regardless of feature count —
      // checkpointed once, every later stage reads it
      .localCheckpoint(true)
    val offsets = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)).toDF("dx", "dy")
    val ring = cells.crossJoin(broadcast(offsets))
      .select((col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"),
        col("cx").as("ocx"), col("cy").as("ocy"))
      .join(cells.select(col("cx"), col("cy"), col("n").as("nn")), Seq("cx", "cy"))
      .groupBy(col("ocx").as("cx"), col("ocy").as("cy"))
      .agg(sum(col("nn")).cast("long").as("ring_sum"),
        count(lit(1)).cast("long").as("ring_cells"))
    val g = cells.agg(
      count(lit(1)).cast("double").as("nc"),
      avg(col("n")).as("mean"),
      // population sd from integer sums: sqrt(Σn²/N − mean²)
      sqrt(sum(col("n") * col("n")).cast("double") / count(lit(1)) -
        avg(col("n")) * avg(col("n"))).as("sd"))
    val z = (col("ring_sum") - col("ring_cells") * col("mean")) /
      (col("sd") * sqrt(col("ring_cells").cast("double") *
        (col("nc") - col("ring_cells")) / (col("nc") - 1.0)))
    cells.join(ring, Seq("cx", "cy"))
      .crossJoin(broadcast(g))
      .select(col("cx"), col("cy"), col("n"), col("ring_sum"), col("ring_cells"),
        round(z, 4).as("gi_z"),
        (z > hotZ).cast("int").as("hot"), (z < -hotZ).cast("int").as("cold"))
      .orderBy(col("cx"), col("cy"))
  }

  /** The C11 oracle body (shared bit arithmetic). */
  def zorderSql: String = {
    val sx = spreadBitsSql("xi")
    val sy = spreadBitsSql("yi")
    s"""g AS (SELECT o_orderkey, x, y,
       |  ((CAST(x AS BIGINT) - 150000) * 65536) // 800001 AS xi,
       |  ((CAST(y AS BIGINT) - 6050000) * 65536) // 1700001 AS yi FROM c),
       |z AS (SELECT *, ($sx | ($sy << 1)) AS zv FROM g),
       |b AS (SELECT *, zv >> 20 AS bucket FROM z)""".stripMargin
  }

  /** C10: nearest-neighbor spatial join — for every probe feature, the
    * closest feature of a big point set (the reference runs proximity
    * geoprocessing over staged FCs; arcpy Near/SpatialJoin). Scale shape:
    * points are bucketed into grid cells and each probe meets ONLY the
    * (2r+1)×(2r+1) cell ring around its own cell (candidates bounded by
    * local density; the join key is the CELL id — always a hash join,
    * never a theta join). A result is CERTIFIED exact when the best ring
    * distance ≤ r·cell — any point outside that ring is farther by
    * construction. Probes the ring can't certify (sparse neighborhoods)
    * go around again with a DOUBLED radius — never a cartesian product:
    * the final radius is computed from the data's own bounding box, so
    * the covering ring provably sees every point and certifies
    * unconditionally (a probe with no match there has an empty corpus).
    * Rounds are log(grid-diameter)-bounded, and each round carries only
    * the still-uncertified probes. Two explosion guards (r13) keep the
    * per-round row generation bounded by live geometry instead of r²:
    * ring cells are clamped per-probe to the ring ∩ point-bbox
    * intersection (cells outside the points' bbox hold no points, so a
    * far probe generates only its overlap — zero rows while out of
    * reach), and the COVERING round does not explode at all: the
    * straggler probes still alive at covering radius must meet every
    * point anyway, so they broadcast against the point table directly
    * (one map-side nested-loop + the same hash argmin; ~(grid
    * diameter)² explode rows per straggler under the old shape).
    * Distances are integer-valued doubles (synthetic meter grids), so
    * the argmin is fp-exact and fully oracle-able against brute
    * force. */
  def nearestJoin(spark: SparkSession, dir: String, cell: Double = 50000.0): DataFrame = {
    val t = Tables(spark, dir)
    val pts = t.orders.select(col("o_orderkey"),
      (lit(150000L) + (col("o_orderkey") * 7919L) % 800001L).cast("double").as("x"),
      (lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L).cast("double").as("y"))
    val probes = t.supplier.select(col("s_suppkey"),
      (lit(150000L) + (col("s_suppkey") * 6007L) % 800001L).cast("double").as("px"),
      (lit(6050000L) + (col("s_suppkey") * 9973L) % 1700001L).cast("double").as("py"))
    nearestJoinOver(spark, pts, probes, cell)
  }

  /** The C10 engine over arbitrary (id,x,y) points and (id,px,py)
    * probes — split out so the sparse-layout spec can drive it with a
    * hostile geometry (empty neighborhoods forcing many widening
    * rounds) against a brute-force oracle. */
  def nearestJoinOver(spark: SparkSession, pts: DataFrame, probes: DataFrame,
      cell: Double): DataFrame = {
    val d2 = (col("x") - col("px")) * (col("x") - col("px")) +
      (col("y") - col("py")) * (col("y") - col("py"))
    def argmin(cand: DataFrame): DataFrame = cand
      .groupBy(col("s_suppkey"))
      .agg(min_by(struct(col("o_orderkey"), col("d2")),
        struct(col("d2"), col("o_orderkey"))).as("b"))
      .select(col("s_suppkey"), col("b.o_orderkey").as("nearest_orderkey"),
        col("b.d2").cast("long").as("dist2"))
    val ptsCell = pts
      .withColumn("cx", floor(col("x") / cell)).withColumn("cy", floor(col("y") / cell))
      .localCheckpoint(true)
    if (ptsCell.head(1).isEmpty || probes.head(1).isEmpty)
      return probes.select(col("s_suppkey"),
        lit(null).cast("long").as("nearest_orderkey"),
        lit(null).cast("long").as("dist2")).limit(0)
    // the covering radius from the data's own bbox: a ring this wide
    // centered anywhere inside the probe/point envelope sees every cell
    val pb = ptsCell.agg(min(col("cx")), max(col("cx")),
      min(col("cy")), max(col("cy"))).head()
    val qb = probes.agg(floor(min(col("px")) / cell), floor(max(col("px")) / cell),
      floor(min(col("py")) / cell), floor(max(col("py")) / cell)).head()
    val rCover = math.max(1L, math.max(
      math.max(pb.getLong(1), qb.getLong(1)) -
        math.min(pb.getLong(0), qb.getLong(0)),
      math.max(pb.getLong(3), qb.getLong(3)) -
        math.min(pb.getLong(2), qb.getLong(2))))
    var remaining = probes.localCheckpoint(true)
    var done: DataFrame = null
    var r = 1L
    var exhausted = false
    val (cxLo, cxHi, cyLo, cyHi) =
      (pb.getLong(0), pb.getLong(1), pb.getLong(2), pb.getLong(3))
    // a ring span clamped to the point bbox; null (dropped by explode)
    // when the ring misses the bbox entirely on this axis
    def span(lo: Column, hi: Column): Column =
      when(lo <= hi, sequence(lo, hi))
    while (!exhausted && remaining.head(1).nonEmpty) {
      val covering = r >= rCover
      val ringBest =
        if (covering) {
          // covering round: every point must be seen anyway, so the
          // straggler probes pair against the full point table — no ring
          // explode (the old shape generated (2·rCover+1)² cells/probe).
          // Broadcast ONLY while the straggler set is genuinely small: in
          // a layout where most probes are far from every point the
          // stragglers are nearly the whole probe table, and forcing an
          // 8 GB-capped broadcast there trades the old gradual degradation
          // for a driver OOM — past the cap, a partitioned cartesian join
          // degrades executor-side instead
          val probeSide =
            if (remaining.count() <= 1000000L) broadcast(remaining)
            else remaining
          argmin(ptsCell.select(col("o_orderkey"), col("x"), col("y"))
            .crossJoin(probeSide).withColumn("d2", d2))
        }
        else {
          val pcx = floor(col("px") / cell)
          val pcy = floor(col("py") / cell)
          val ringed = remaining
            .withColumn("cx", explode(span(
              greatest(pcx - r, lit(cxLo)), least(pcx + r, lit(cxHi)))))
            .withColumn("cy", explode(span(
              greatest(pcy - r, lit(cyLo)), least(pcy + r, lit(cyHi)))))
          argmin(ringed.join(ptsCell, Seq("cx", "cy")).withColumn("d2", d2))
        }
      // certification bound: anything outside the ring is ≥ r·cell away,
      // so a best STRICTLY under r·cell cannot be beaten (nor tied) by an
      // unseen point; the covering round saw every point, so its argmin is
      // unconditionally the true nearest
      val certified =
        if (covering) ringBest
        else ringBest.filter(col("dist2") < (r * r * cell * cell).toLong)
      done = if (done == null) certified.localCheckpoint(true)
        else done.union(certified).localCheckpoint(true)
      if (covering) exhausted = true
      else remaining = remaining
        .join(done.select("s_suppkey"), Seq("s_suppkey"), "left_anti")
        .localCheckpoint(true)
      r *= 2
    }
    done.orderBy(col("s_suppkey"))
  }

  /** C6: infer SR from coordinate magnitudes (sr_utils.py:245
    * _infer_sr_from_coords): degrees → 4326, Sweden meters → 3006, else 0. */
  def srInfer(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir).orders
      .withColumn("cx", when(col("o_orderkey") % 2 === 0,
          ((col("o_orderkey") * 31L) % 400L).cast("double") - 200.0)
        .otherwise((lit(150000L) + (col("o_orderkey") * 7919L) % 800001L).cast("double")))
      .withColumn("cy", when(col("o_orderkey") % 2 === 0,
          ((col("o_orderkey") * 37L) % 200L).cast("double") - 100.0)
        .otherwise((lit(6050000L) + (col("o_orderkey") * 104729L) % 1700001L).cast("double")))
    df.withColumn("inferred_sr",
        when(inBox(col("cx"), col("cy"), -180, -90, 180, 90), 4326)
          .when(inBox(col("cx"), col("cy"), 200000, 6100000, 900000, 7700000), 3006)
          .otherwise(0))
      .groupBy(col("inferred_sr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("inferred_sr"))
  }

  /** C15: grid-bucketed DBSCAN — density clustering over planar points,
    * the spatial clustering verb C12's fixed-grid hotspots cannot
    * express (a hotspot grid reports dense CELLS; DBSCAN reports dense
    * REGIONS of arbitrary shape, with the core/border/noise role split
    * the original algorithm defines). Exact integer geometry end to
    * end: squared distances against eps², role thresholds, min-label
    * cluster ids — no floats anywhere, so both engines agree
    * bit-for-bit, border ties resolved to the SMALLEST adjacent core
    * cluster label.
    *
    * Scale design: the neighbor search is the classic grid-bucket
    * equi-join — each point lands in an eps-sized cell, one side
    * explodes into its 3×3 cell ring, and the join key is the CELL (a
    * hash join, never an all-pairs or theta join; per-key fan-out is
    * the local density, the quantity DBSCAN is measuring anyway). The
    * core-core graph goes through the F19 component solver (per-round
    * checkpointed label frame, loud non-convergence). */
  def dbscan(spark: SparkSession, dir: String,
      eps: Long = 3000L, minPts: Long = 5L): DataFrame = {
    // facility-like point model: 42 well-separated 16 km sites (80 km
    // grid pitch) with tight scatter, plus 5% uniform background noise —
    // clustered structure at every SF, unlike the uniform synthXY model
    // whose density sits far below any sensible eps
    val k = col("o_orderkey")
    val cid = k % 42
    val isNoise = k % 20 === 0
    val pts = Tables(spark, dir).orders.filter(k % 5 === 0)
      .select(k.as("id"),
        when(isNoise, lit(150000L) + (k * 7919L) % 800001L)
          .otherwise(lit(250000L) + (cid % 7) * 80000L +
            (k * 7919L) % 16001L - 8000L).as("xi"),
        when(isNoise, lit(6050000L) + (k * 104729L) % 1700001L)
          .otherwise(lit(6200000L) + expr("(o_orderkey % 42) div 7") * 80000L +
            (k * 104729L) % 16001L - 8000L).as("yi"))
    dbscanOf(pts, eps, minPts)
  }

  /** The C15 core over an explicit (id, xi, yi) integer point frame —
    * the spec plants clusters, borders, bridges and loners through the
    * SAME path as the registered query. */
  def dbscanOf(pts0: DataFrame, eps: Long, minPts: Long): DataFrame = {
    val pts = pts0.localCheckpoint(true)
    val home = pts
      .withColumn("cx", expr(s"xi div $eps"))
      .withColumn("cy", expr(s"yi div $eps"))
    val ring = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probes = home.select(col("id").as("nid"), col("xi").as("bxi"),
        col("yi").as("byi"),
        explode(array(ring.map { case (dx, dy) =>
          struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
        }: _*)).as("c"))
      .select(col("nid"), col("bxi"), col("byi"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val nb = home.join(probes, Seq("cx", "cy"))
      .filter(col("id") =!= col("nid") &&
        (col("xi") - col("bxi")) * (col("xi") - col("bxi")) +
          (col("yi") - col("byi")) * (col("yi") - col("byi")) <= eps * eps)
      .select(col("id"), col("nid"))
      .localCheckpoint(true)
    val core = nb.groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minPts).select(col("id"))
      .localCheckpoint(true)
    // core-core adjacency → components; isolated cores label themselves
    // (they are passed as nodes)
    val corePairs = nb
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi")
      .join(core, Seq("id"), "left_semi")
      .filter(col("id") < col("nid"))
      .select(col("id").as("d1"), col("nid").as("d2"))
    val labels = Dedup.connectedComponents(
      core.select(col("id").as("doc_id")), corePairs)
      .select(col("doc_id").as("id"), col("label").as("cluster"))
      .localCheckpoint(true)
    // border: non-core with ≥1 core neighbor → smallest adjacent core
    // cluster
    val border = nb
      .join(core, Seq("id"), "left_anti")
      .join(labels.withColumnRenamed("id", "nid"), Seq("nid"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    pts
      .join(labels.withColumn("is_core", lit(1)), Seq("id"), "left")
      .join(border.withColumnRenamed("cluster", "b_cluster"), Seq("id"), "left")
      .select(col("id"), col("xi"), col("yi"),
        when(col("is_core") === 1, lit("core"))
          .when(col("b_cluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("cluster"), col("b_cluster")).as("cluster"))
      .orderBy(col("id"))
  }

  /** C16 `geo_sr_declared`: DECLARED-CRS detection + reconciliation —
    * the last reference micro-gap (sr_utils.py:144-198
    * detect_sr_from_geojson / _check_sr_consistency): each source ships
    * a legacy-GeoJSON FeatureCollection whose `crs.properties.name`
    * member (pre-RFC 7946) may declare the SR. The reference's parse
    * order, replayed exactly:
    *   - non-dict / corrupt document → undeclared (0), BEFORE the crs
    *     lookup (the reference's isinstance guard);
    *   - absent, null, or empty `crs` member (Python falsy) → 4326
    *     (the GeoJSON default);
    *   - name contains 'EPSG:' → int(text after the FIRST 'EPSG:',
    *     whitespace-split, first token); a parse failure (the
    *     urn:ogc:def:crs:EPSG::n form's ':n' tail) returns UNDECLARED
    *     (0) — it does NOT fall through to the CRS84 check;
    *   - name == 'CRS84' case-insensitively → 4326;
    *   - anything else → undeclared (0).
    * The declared code then reconciles against the C6
    * coordinate-magnitude inference per source document
    * (_check_sr_consistency's order: uninferable coordinates first,
    * then undeclared, then declared≠inferred = mismatch, else
    * consistent).
    *
    * The planted corpus drives every class: 24 sources cross 6 crs-name
    * variants with 3 coordinate regimes (degrees / SWEREF99 TM meters /
    * out-of-range), so consistent, mismatch, undeclared and uninferable
    * all appear, including the whitespace-split and urn parse-failure
    * paths.
    *
    * Scale shape: the parse is per-row codegen'd JSON-path extraction +
    * string ops (no UDF, no shuffle); the report is ONE hash agg to
    * |sources| rows. At 100 TB the docs column prunes to the header
    * fields the JSON paths touch. */
  def srDeclared(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val source = (k % 24).cast("int")
    val variant = source % 6
    // regime decorrelated from the variant ((source div 6) % 3 — source %
    // 3 is DETERMINED by variant mod 3, which parked both declared-0
    // variants on uninferable coordinates, so the corpus never produced
    // the 'undeclared' class; with the div the urn parse-fail variant
    // meets inferable coordinates and all four classes appear)
    val regime = (source / 6).cast("int") % 3
    val xi = when(regime === 0, (k * 31L) % 360L - 180L)
      .when(regime === 1, lit(250000L) + (k * 7919L) % 600001L)
      .otherwise(lit(2000000L) + (k * 7919L) % 1000000L)
    val yi = when(regime === 0, (k * 37L) % 180L - 90L)
      .when(regime === 1, lit(6200000L) + (k * 104729L) % 1400001L)
      .otherwise(lit(1000000L) + (k * 104729L) % 1000000L)
    val crsName = when(variant === 0, "EPSG:3006")
      .when(variant === 1, "EPSG:4326")
      .when(variant === 2, "urn:ogc:def:crs:EPSG::3006")
      .when(variant === 4, "crs84")
      .when(variant === 5, "EPSG:3006 (SWEREF99 TM)")
    val crsFragment = when(variant === 3, lit(""))
      .otherwise(concat(lit("\"crs\":{\"type\":\"name\",\"properties\":{\"name\":\""),
        crsName, lit("\"}},")))
    val docs = Tables(spark, dir).orders
      .select(k.as("doc_id"), source.as("source"),
        concat(lit("{\"type\":\"FeatureCollection\","), crsFragment,
          lit("\"features\":[{\"type\":\"Feature\",\"geometry\":" +
            "{\"type\":\"Point\",\"coordinates\":["),
          xi.cast("string"), lit(","), yi.cast("string"),
          lit("]}}]}")).as("doc"))
    srDeclaredOf(docs)
  }

  /** The parse + reconcile stage over any (doc_id, source, doc) frame —
    * split out so the spec can plant handwritten GeoJSON covering each
    * branch of the reference's parser. ONE `from_json` parse per row
    * (every extraction walks the parsed struct — `get_json_object`
    * would re-parse the document per path, measured 2.5 s vs ~1 s on
    * the sf0.1 corpus); absent members surface as NULL struct fields,
    * which is exactly the reference's dict.get semantics. */
  def srDeclaredOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("j", from_json(col("doc"), org.apache.spark.sql.types.DataType.fromDDL(
        "struct<crs:struct<type:string,properties:struct<name:string>>," +
          "features:array<struct<geometry:struct<coordinates:array<double>>>>," +
          "_graft_corrupt:string>"),
        Map("columnNameOfCorruptRecord" -> "_graft_corrupt")))
      .withColumn("crs_name", col("j.crs.properties.name"))
      // Reference truthiness ladder (sr_utils.py:144-198): a non-dict or
      // corrupt document returns None (undeclared) BEFORE the crs lookup —
      // PERMISSIVE from_json parks those rows' raw text in the declared
      // corrupt-record field (a truncated object, a JSON array, a scalar
      // all land there; a well-formed object leaves it NULL), so
      // `_graft_corrupt IS NOT NULL` is that branch. An absent, null, or
      // empty `crs` member is falsy (`if not crs`) and takes the GeoJSON
      // WGS84 default. One declared divergence: the schema-pruned parse
      // cannot tell `{"crs":{}}` (falsy → 4326) from a crs holding only
      // unrecognized members like `{"crs":{"foo":1}}` (truthy → name ''
      // → undeclared in the reference) — both parse to an all-null
      // struct and take the falsy path here.
      .withColumn("doc_invalid",
        col("j").isNull || col("j._graft_corrupt").isNotNull)
      .withColumn("crs_falsy", col("j.crs").isNull ||
        (col("j.crs.type").isNull && col("j.crs.properties").isNull))
      // int(name.split('EPSG:')[1].split()[0]): text after the first
      // 'EPSG:', then the FIRST whitespace-delimited token with leading
      // whitespace discarded — Python .split() semantics, so
      // "EPSG: 3006" parses to 3006 (tabs included); try_cast = the
      // reference's try/except int(); the oracle applies the same regex
      .withColumn("epsg_code", expr(
        "try_cast(nullif(regexp_extract(try_element_at(" +
          "split(crs_name, 'EPSG:'), 2), '^\\\\s*(\\\\S+)', 1), '') as int)"))
      .withColumn("declared_sr",
        when(col("doc_invalid"), lit(0))
          .when(col("crs_falsy"), lit(4326))
          .when(instr(col("crs_name"), "EPSG:") > 0,
            coalesce(col("epsg_code"), lit(0)))
          .when(upper(col("crs_name")) === "CRS84", lit(4326))
          .otherwise(lit(0)))
      .withColumn("cx", expr("try_element_at(j.features, 1).geometry.coordinates[0]"))
      .withColumn("cy", expr("try_element_at(j.features, 1).geometry.coordinates[1]"))
      .withColumn("inferred_sr",
        when(inBox(col("cx"), col("cy"), -180, -90, 180, 90), 4326)
          .when(inBox(col("cx"), col("cy"), 200000, 6100000, 900000, 7700000), 3006)
          .otherwise(0))
      .withColumn("sr_class",
        when(col("inferred_sr") === 0, "uninferable")
          .when(col("declared_sr") === 0, "undeclared")
          .when(col("declared_sr") =!= col("inferred_sr"), "mismatch")
          .otherwise("consistent"))
      .groupBy(col("source"), col("declared_sr"), col("inferred_sr"),
        col("sr_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("doc_checksum"))
      .orderBy(col("source"))
}
