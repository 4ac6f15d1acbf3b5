package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for the driver contract: every registered query
  * runs at sf0.001, every oracle key resolves to a query, the flagship
  * returns rows. */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs and is non-degenerate") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // every query should produce rows at sf0.001 (empty results make the
      // oracle comparison vacuous)
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
