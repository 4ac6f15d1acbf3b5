package graft

import graft.operators.LoadOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D34 ordered-changelog apply: latest-wins reduction, fold/merge
  * algebra, tombstone semantics. */
class ChangelogSpec extends AnyFunSuite with SparkTestBase {

  private def snapshotRows(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select(col("key").cast("long"), col("seq").cast("long"), col("op"),
        col("value").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  test("snapshot equals a brute-force per-key replay") {
    val log = LoadOps.ordersChangelog(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val brute = log.groupBy(_._1).map { case (_, evs) => evs.maxBy(_._2) }
      .filter(_._3 != "D").toSet
    assert(snapshotRows(LoadOps.changelogSnapshot(LoadOps.ordersChangelog(spark, sfDir)))
      == brute)
    assert(brute.nonEmpty)
  }

  test("row order never matters: a shuffled changelog reduces identically") {
    val base = LoadOps.ordersChangelog(spark, sfDir)
    val shuffled = base.repartition(7, col("value")) // arbitrary non-key placement
      .sortWithinPartitions(col("seq").desc, col("key").desc)
    assert(snapshotRows(LoadOps.changelogSnapshot(shuffled))
      == snapshotRows(LoadOps.changelogSnapshot(base)))
  }

  test("incremental folds equal the one-shot apply, tombstones carried") {
    val base = LoadOps.ordersChangelog(spark, sfDir)
    // batch boundary lands mid-key-history (per-generation batches), and
    // the generations arrive OUT of seq order — the reduced state must
    // carry (seq, op) so a late-arriving EARLIER event cannot override
    val batches = Seq(1L, 3L, 0L, 2L).map(g => base.filter(col("seq") === g))
    val folded = batches.reduceLeft((state, b) => LoadOps.changelogLatest(state.unionByName(b)))
    assert(snapshotRows(folded.filter(col("op") =!= "D"))
      == snapshotRows(LoadOps.changelogSnapshot(base)))
  }

  test("delete hides a key; a later re-insert revives it") {
    val snap = LoadOps.changelogSnapshot(LoadOps.ordersChangelog(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    val keys = Tables(spark, sfDir).orders.select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    keys.filter(k => k % 5 == 0 && k % 10 != 0).foreach(k =>
      assert(!snap.contains(k), s"tombstoned key $k still live"))
    keys.filter(_ % 10 == 0).foreach(k =>
      assert(snap.get(k).contains(7.5), s"revived key $k should carry 7.5"))
    assert(keys.exists(k => k % 5 == 0 && k % 10 != 0) && keys.exists(_ % 10 == 0))
  }

  test("plan shape: the reduction is one shuffle, no window or join") {
    val plan = LoadOps.changelogSnapshot(LoadOps.ordersChangelog(spark, sfDir))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastHashJoin"), s"unexpected operator in:\n$plan")
  }
}
