package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.{col, lit}
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
    val truth = Tables(spark, sfDir).eventsSec
      .withColumn("day", expr("sec div 86400").cast("long"))
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

  test("heavy hitters: MG screen survives an adversarial stream and equals the exact plan") {
    import spark.implicits._
    // adversarial order for a k=2 summary: the heavy key arrives LAST,
    // after 8 distinct decoys have churned the two counters — MG must
    // still surface any key with count > n/k (here 12 > 20/2)
    val decoys = (100L to 107L).flatMap(d => Seq(d))
    val stream = (decoys ++ Seq.fill(12)(7L)).toDF("user_id").coalesce(1)
    val k = 2
    val cand = stream.select(col("user_id").cast("long")).as[Long].mapPartitions { it =>
      val counters = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { x =>
        if (counters.contains(x)) counters(x) += 1L
        else if (counters.size < k) counters(x) = 1L
        else counters.toSeq.foreach { case (key, c) =>
          if (c == 1L) counters.remove(key) else counters(key) = c - 1L
        }
      }
      counters.keysIterator
    }.collect().toSet
    assert(cand.contains(7L), s"MG summary lost the heavy key: $cand")
    // the two-pass operator's output is bit-identical to the exact
    // full-shuffle formulation on real data
    val fast = Relational.qHeavyHitters(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables(spark, sfDir).events.count()
    val exact = Tables(spark, sfDir).events
      .groupBy(col("user_id").cast("long").as("user_id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .filter(col("n") > n / 150.0)
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sameElements(exact), s"fast=${fast.length} exact=${exact.length}")
  }

  test("skyline: bucketed two-pass frontier equals brute-force dominance") {
    val got = Relational.qSkyline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq
    val pts = Tables(spark, sfDir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice"), col("l_discount"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val byGroup = pts.groupBy(p => (p._1, p._2))
    val brute = pts.filter { case (f, m, p, d, _) =>
      !byGroup((f, m)).exists { case (_, _, p2, d2, _) =>
        p2 <= p && d2 >= d && (p2 < p || d2 > d) }
    }.sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("skyline frontier is strictly monotone within each group") {
    // Pareto property: along the frontier, price and discount rise
    // together — one point per price, strictly increasing discount
    Relational.qSkyline(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).values.foreach { g =>
        val pd = g.map(_._2).sortBy(_._1)
        pd.sliding(2).foreach {
          case Array((p1, d1), (p2, d2)) =>
            assert(p1 < p2 && d1 < d2, s"frontier not strictly monotone: ($p1,$d1) ($p2,$d2)")
          case _ =>
        }
      }
  }

  test("cohort retention matches a brute-force recompute and its invariants") {
    val got = Relational.qCohortRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    // brute force from raw events, independent path
    val uw = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec div 86400 div 7 as week")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => (u, ws.map(_._2).min) }
    val sizes = cohort.values.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val brute = uw.map { case (u, w) => ((cohort(u), w - cohort(u)), u) }
      .groupBy(_._1).map { case ((cw, off), g) =>
        val n = g.map(_._2).distinct.size.toLong
        (cw, off, n, sizes(cw), math.rint(n.toDouble / sizes(cw) * 10000) / 10000)
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got == brute)
    // offset-0 rows ARE the cohort definition: every member is active in
    // their own first week, so retention must be exactly 1.0
    got.filter(_._2 == 0L).foreach { case (cw, _, n, size, rate) =>
      assert(n == size && rate == 1.0, s"cohort $cw offset 0 broken: n=$n size=$size")
    }
    assert(got.forall(_._2 >= 0L), "negative week offset: cohort later than activity")
  }

  test("markov transitions match a brute-force per-user replay and PPM invariants hold") {
    val got = Relational.qMarkovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // independent path: sequence every user in (sec, event_id) order and
    // count adjacent pairs
    val ev = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = ev.groupBy(_._1).values.flatMap { g =>
      val seqd = g.sortBy(e => (e._2, e._3)).map(_._4)
      seqd.dropRight(1).zip(seqd.drop(1))
    }.toSeq.groupBy(p => p).map { case (k, v) => (k, v.size.toLong) }
    val gotPairs = got.map(t => ((t._1, t._2), t._3)).toMap
    assert(gotPairs == brute, "transition counts diverge from the replay")
    // state_total really is the per-state row sum, and PPM probabilities
    // floor-sum to within |next states| of exactly 1e6
    got.groupBy(_._1).foreach { case (state, rows) =>
      val total = rows.map(_._3).sum
      assert(rows.forall(_._4 == total), s"$state state_total mismatch")
      val pSum = rows.map(_._5).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rows.length,
        s"$state PPM floor sum out of range: $pSum")
    }
    // every non-terminal event contributes exactly one transition
    val expected = ev.length - ev.map(_._1).distinct.length
    assert(got.map(_._3).sum == expected, "transition count != events - users")
  }
}
