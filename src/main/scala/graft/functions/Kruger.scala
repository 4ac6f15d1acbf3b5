package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Krüger-series transverse-Mercator forward projection on the GRS80
  * ellipsoid, parameterized by zone constants (central meridian, scale at
  * the central meridian, false easting) — the SWEREF99 family differs
  * ONLY in those three numbers. Instances: [[Kruger]] (EPSG:3006, the
  * national grid) and [[Sweref991630]] (EPSG:3010 — the reference's
  * PRODUCTION target: /root/reference/config.yaml `target_srid: 3010`,
  * /root/reference/etl/process.py:93/:129/:144 project to it
  * explicitly). Fourth-order series: sub-mm within ±10° of the central
  * meridian.
  *
  * Built ONLY from exp/ln/sqrt/sin/cos/atan — DuckDB 1.0 has no
  * hyperbolic functions, so sinh/cosh/atanh are expanded identically on
  * both sides ([[forward]] for Spark Columns, [[forwardSql]] emits the
  * same tree as SQL text with the same double literals); per-row pure
  * arithmetic → codegen'd, shuffle-free, partition-prunable.
  */
class TmProjection(val lon0: Double, val k0: Double, val falseEasting: Double) {
  val a  = 6378137.0
  val f  = 1.0 / 298.257222101
  val n  = f / (2.0 - f)
  val A  = a / (1.0 + n) * (1.0 + n * n / 4.0 + n * n * n * n / 64.0)
  /** 2√n/(1+n): the conformal-latitude coefficient. */
  val rt = 2.0 * math.sqrt(n) / (1.0 + n)
  /** Forward series coefficients α₁..α₄ (Krüger 1912, n-series). */
  val alpha: Seq[Double] = Seq(
    n / 2.0 - 2.0 * n * n / 3.0 + 5.0 * n * n * n / 16.0 + 41.0 * n * n * n * n / 180.0,
    13.0 * n * n / 48.0 - 3.0 * n * n * n / 5.0 + 557.0 * n * n * n * n / 1440.0,
    61.0 * n * n * n / 240.0 - 103.0 * n * n * n * n / 140.0,
    49561.0 * n * n * n * n / 161280.0)
  /** Inverse series coefficients β₁..β₄ (used by the round-trip spec). */
  val beta: Seq[Double] = Seq(
    n / 2.0 - 2.0 * n * n / 3.0 + 37.0 * n * n * n / 96.0 - n * n * n * n / 360.0,
    n * n / 48.0 + n * n * n / 15.0 - 437.0 * n * n * n * n / 1440.0,
    17.0 * n * n * n / 480.0 - 37.0 * n * n * n * n / 840.0,
    4397.0 * n * n * n * n / 161280.0)

  private def sinhC(x: Column): Column = (exp(x) - exp(-x)) / 2.0
  private def coshC(x: Column): Column = (exp(x) + exp(-x)) / 2.0
  private def atanhC(x: Column): Column = log((lit(1.0) + x) / (lit(1.0) - x)) * 0.5

  /** (easting, northing) Columns from lon/lat degree Columns. */
  def forward(lon: Column, lat: Column): (Column, Column) = {
    val phi = radians(lat)
    val lam = radians(lon - lon0)
    val s = sin(phi)
    val t = sinhC(atanhC(s) - lit(rt) * atanhC(lit(rt) * s))
    val xip = atan(t / cos(lam))
    val etap = atanhC(sin(lam) / sqrt(lit(1.0) + t * t))
    val xi = alpha.zipWithIndex.foldLeft(xip) { case (acc, (aj, j)) =>
      acc + lit(aj) * sin(lit(2.0 * (j + 1)) * xip) * coshC(lit(2.0 * (j + 1)) * etap)
    }
    val eta = alpha.zipWithIndex.foldLeft(etap) { case (acc, (aj, j)) =>
      acc + lit(aj) * cos(lit(2.0 * (j + 1)) * xip) * sinhC(lit(2.0 * (j + 1)) * etap)
    }
    (lit(falseEasting) + lit(k0 * A) * eta, lit(k0 * A) * xi)
  }

  /** The same forward series as DuckDB SQL text: a CTE body computing
    * easting/northing from columns `lon`/`lat` of relation `src`. Double
    * literals are interpolated from the SAME Scala constants, so both
    * engines evaluate an identical expression tree. */
  def forwardSql(src: String): String = {
    def sinhS(x: String) = s"((exp($x) - exp(-($x))) / 2.0)"
    def coshS(x: String) = s"((exp($x) + exp(-($x))) / 2.0)"
    def atanhS(x: String) = s"(ln((1.0 + $x) / (1.0 - $x)) * 0.5)"
    val s0 = "sin(radians(lat))"
    val t = sinhS(s"${atanhS(s0)} - $rt * ${atanhS(s"$rt * $s0")}")
    val xiSum = alpha.zipWithIndex.map { case (aj, j) =>
      s" + $aj * sin(${2.0 * (j + 1)} * xip) * ${coshS(s"${2.0 * (j + 1)} * etap")}"
    }.mkString
    val etaSum = alpha.zipWithIndex.map { case (aj, j) =>
      s" + $aj * cos(${2.0 * (j + 1)} * xip) * ${sinhS(s"${2.0 * (j + 1)} * etap")}"
    }.mkString
    s"""t0 AS (SELECT *, $t AS t, radians(lon - $lon0) AS lam FROM $src),
       |t1 AS (SELECT *, atan(t / cos(lam)) AS xip,
       |  ${atanhS("(sin(lam) / sqrt(1.0 + t * t))")} AS etap FROM t0),
       |t2 AS (SELECT *, (xip$xiSum) AS xi, (etap$etaSum) AS eta FROM t1),
       |tm AS (SELECT *, $falseEasting + ${k0 * A} * eta AS easting,
       |  ${k0 * A} * xi AS northing FROM t2)""".stripMargin
  }

  // ---- plain-double forward/inverse (round-trip spec; same formulas) ----

  def forwardLocal(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - lon0)
    def atanh(x: Double) = math.log((1.0 + x) / (1.0 - x)) * 0.5
    val s = math.sin(phi)
    val t = math.sinh(atanh(s) - rt * atanh(rt * s))
    val xip = math.atan(t / math.cos(lam))
    val etap = atanh(math.sin(lam) / math.sqrt(1.0 + t * t))
    val xi = xip + alpha.zipWithIndex.map { case (aj, j) =>
      aj * math.sin(2.0 * (j + 1) * xip) * math.cosh(2.0 * (j + 1) * etap) }.sum
    val eta = etap + alpha.zipWithIndex.map { case (aj, j) =>
      aj * math.cos(2.0 * (j + 1) * xip) * math.sinh(2.0 * (j + 1) * etap) }.sum
    (falseEasting + k0 * A * eta, k0 * A * xi)
  }

  /** Inverse projection (β-series + conformal-latitude fixed point). */
  def inverseLocal(easting: Double, northing: Double): (Double, Double) = {
    def atanh(x: Double) = math.log((1.0 + x) / (1.0 - x)) * 0.5
    val xi = northing / (k0 * A)
    val eta = (easting - falseEasting) / (k0 * A)
    val xip = xi - beta.zipWithIndex.map { case (bj, j) =>
      bj * math.sin(2.0 * (j + 1) * xi) * math.cosh(2.0 * (j + 1) * eta) }.sum
    val etap = eta - beta.zipWithIndex.map { case (bj, j) =>
      bj * math.cos(2.0 * (j + 1) * xi) * math.sinh(2.0 * (j + 1) * eta) }.sum
    val tau = math.sin(xip) / math.sqrt(math.sinh(etap) * math.sinh(etap) + math.cos(xip) * math.cos(xip))
    // fixed point for sinφ: atanh(s) = asinh(τ·…) inverse of the forward
    // conformal map; converges quadratically for |φ| < 89°
    var s = tau / math.sqrt(1.0 + tau * tau)
    (0 until 30).foreach { _ =>
      s = math.tanh(math.log(tau + math.sqrt(1.0 + tau * tau)) + rt * atanh(rt * s))
    }
    val lat = math.toDegrees(math.asin(s))
    val lon = lon0 + math.toDegrees(math.atan2(math.sinh(etap), math.cos(xip)))
    (lon, lat)
  }
}

/** EPSG:3006 SWEREF99 TM — the national grid: central meridian 15°E,
  * k0 = 0.9996, false easting 500 000 m. */
object Kruger extends TmProjection(15.0, 0.9996, 500000.0)

/** EPSG:3010 SWEREF99 16 30 — the reference's production `target_srid`
  * (/root/reference/config.yaml; process.py:93/:129/:144): a LOCAL zone,
  * central meridian 16°30′E, scale exactly 1 (tangent cylinder), false
  * easting 150 000 m. */
object Sweref991630 extends TmProjection(16.5, 1.0, 150000.0)
