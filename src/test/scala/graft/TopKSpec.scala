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

  test("k bound is respected per group") {
    val counts = Relational.qTopKPerGroup(spark, sfDir)
      .groupBy("o_custkey").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 3))
  }
}
