package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom TopKPerGroup operator (logical node + strategy +
  * bounded-heap exec). */
class TopKSpec extends AnyFunSuite with SparkTestBase {

  test("custom exec appears in the physical plan (strategy fires)") {
    val df = Relational.qTopKPerGroup(spark, sfDir)
    // executedPlan is an unexpanded AdaptiveSparkPlan before execution;
    // sparkPlan shows the planned physical operators
    val physical = df.queryExecution.sparkPlan
    assert(physical.exists(_.isInstanceOf[graft.plans.TopKPerGroupExec]),
      s"plan was:\n$physical")
  }

  test("custom top-k matches the window-function formulation exactly") {
    val fast = Relational.qTopKPerGroup(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val ref = Relational.qWindowTopK(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_totalprice").desc,
        org.apache.spark.sql.functions.col("o_orderkey"))
      .collect().map(_.toSeq).toSeq
    assert(fast == ref)
  }

  test("bucketed join plans without a hash-partition shuffle") {
    graft.operators.LoadOps.bucketedJoin(spark, sfDir).collect() // materialize tables
    // at test scale the planner prefers broadcast (which also avoids the
    // shuffle); disable it to expose the bucketed sort-merge path a big
    // cluster would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("k bound is respected per group") {
    val counts = Relational.qTopKPerGroup(spark, sfDir)
      .groupBy("o_custkey").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 3))
  }

  test("sliding distinct: window=1 is plain daily distinct, wider windows only grow") {
    val daily = Relational.qSlidingDistinct(spark, sfDir, window = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weekly = Relational.qSlidingDistinct(spark, sfDir, window = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(daily.keySet == weekly.keySet)
    // truth for window=1 straight from the table
    import org.apache.spark.sql.functions._
    val truth = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("day", expr("(ts div 1000000000) div 86400").cast("long"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(daily == truth, "window=1 must equal per-day distinct")
    daily.keySet.foreach(d => assert(weekly(d) >= daily(d),
      s"day $d: widening the window shrank the count"))
    // the range condition is rewritten to an equi key: the plan must
    // hash-join (broadcast semi), never nested-loop over the day range
    val p = Relational.qSlidingDistinct(spark, sfDir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"existing-days filter is not a broadcast semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sliding window planned as a nested loop:\n$p")
  }
}
