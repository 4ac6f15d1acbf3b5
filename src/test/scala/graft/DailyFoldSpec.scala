package graft

import graft.operators.LoadOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Division-contract proof for the shared daily fold (D40-D64 family,
  * G-series twins): Spark `div` and the oracle's DuckDB 1.x integer `//`
  * BOTH truncate toward zero for every sign combination, so a deployment
  * with signed daily sums (refund ledgers) replays hash-exactly through
  * `dailyMd` with no non-negativity guard. The DuckDB side was measured
  * on the oracle engine itself (duckdb 1.0.0):
  *   SELECT -7 // 2   → -3   (floor would be -4)
  *   SELECT -1 // 3   →  0   (floor would be -1)
  *   SELECT -999999999999 // 7 → -142857142857 (floor: …858)
  * This spec pins the Spark half to the same truncation values on a
  * planted signed frame, retiring the r14 "assume non-negative" note. */
class DailyFoldSpec extends AnyFunSuite with SparkTestBase {

  private def plant() = {
    import spark.implicits._
    Seq(
      // (source, day, cents): negative sums with non-zero remainders —
      // the exact cells where truncation and floor diverge
      ("neg", 0L, -3L), ("neg", 0L, -4L),          // sum -7, n 2
      ("neg", 1L, 0L), ("neg", 1L, 0L), ("neg", 1L, -1L), // sum -1, n 3
      ("neg", 2L, 5L), ("neg", 2L, -9L),           // sum -4, n 2
      ("neg", 3L, 7L), ("neg", 3L, 0L),            // positive control
      ("big", 0L, -999999999999L), ("big", 0L, 0L), ("big", 0L, 0L),
      ("big", 0L, 0L), ("big", 0L, 0L), ("big", 0L, 0L), ("big", 0L, 0L)
    ).toDF("source", "day", "cents")
  }

  test("daily fold truncates negative sums toward zero, matching DuckDB //") {
    val md = LoadOps.dailyMdOf(plant()).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(md(("neg", 0L)) == -3L, "sum -7 over 2: truncation says -3, floor -4")
    assert(md(("neg", 1L)) == 0L, "sum -1 over 3: truncation says 0, floor -1")
    assert(md(("neg", 2L)) == -2L, "sum -4 over 2")
    assert(md(("neg", 3L)) == 3L, "positive control: 7 over 2")
    assert(md(("big", 0L)) == -142857142857L,
      "large-magnitude negative: truncation, matching the measured DuckDB row")
  }

  test("downstream detectors accept a signed daily frame (no guard, no crash)") {
    val daily = LoadOps.dailyMdOf(plant())
    // CUSUM pages around the per-source training mean; a signed md series
    // must fold without overflow or sign surprises
    val cs = LoadOps.cusumOver(daily, LoadOps.CusumKCents, LoadOps.CusumHCents)
      .filter(col("source") === "neg").collect()
    assert(cs.length == 4, "one CUSUM row per planted day")
    val mds = cs.map(_.getAs[Long]("md")).toSet
    assert(mds == Set(-3L, 0L, -2L, 3L),
      "the detector sees the truncated signed dailies unchanged")
    // retrospective changepoint over the signed series localizes without
    // a 0/0 degeneracy (its pooled variance floors by design)
    val cp = LoadOps.changepointOver(daily.filter(col("source") === "neg"),
      LoadOps.ChangepointBar).collect()
    assert(cp.length == 1, "neg source has >=3 days, so it must be scored")
  }
}
