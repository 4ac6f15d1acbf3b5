package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-layout specs for the scale-sensitive spatial/matching families
  * (SURVEY stretch, r11 task 8): the registered wires all plant FRIENDLY
  * geometry, so a plan that silently degenerates on real-world layouts
  * (empty neighborhoods, one packed cell, stop-gram catalogs) would never
  * show. Each test drives the operator core with an adversarial layout,
  * checks the answer against an independent definition, and sweeps every
  * executed plan for the degenerate shape (a cartesian product). The
  * nearest-join hostile case lives in GeoSpec (ring widening). */
class AdversarialLayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Run `body`, returning (result, every executed plan string). */
  private def withPlans[T](body: => T): (T, Seq[String]) = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val r = try {
      val out = body
      org.apache.spark.GraftTestShims.flushListeners(spark.sparkContext)
      out
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    (r, plans.asScala.toSeq)
  }

  private def assertNoCartesian(plans: Seq[String], ctx: String): Unit = {
    assert(plans.nonEmpty, s"$ctx: listener captured no plans")
    plans.foreach(p => assert(!p.contains("CartesianProduct"),
      s"$ctx: cartesian product in an executed plan:\n${p.take(1500)}"))
  }

  test("dbscan all-noise layout: empty neighborhoods, everyone noise, no cartesian") {
    // every point alone — eps-balls all empty; the cell join must stay a
    // hash join producing ZERO neighbor pairs, not degenerate
    val pts = (1L to 60L).map(i => (i, i * 100000L, (i * 37L % 60L) * 100000L))
      .toDF("id", "xi", "yi")
    val (rows, plans) = withPlans {
      graft.operators.Geo.dbscanOf(pts, eps = 3000L, minPts = 3L).collect()
    }
    assert(rows.length == 60)
    rows.foreach { r =>
      assert(r.getString(3) == "noise", s"isolated point ${r.getLong(0)} not noise")
      assert(r.isNullAt(4), "noise must carry no cluster label")
    }
    assertNoCartesian(plans, "dbscan all-noise")
  }

  test("dbscan single packed cell: one blob, all core, one cluster, no cartesian") {
    // the opposite extreme: every point inside ONE eps-cell — per-cell
    // fan-out is the local density (DBSCAN's own subject), but the join
    // key must remain the cell id and the blob must resolve to a single
    // cluster labeled by its smallest member
    val blob = (1L to 40L).map(i => (i, 1000L + i % 7, 2000L + i % 5))
      .toDF("id", "xi", "yi")
    val (rows, plans) = withPlans {
      graft.operators.Geo.dbscanOf(blob, eps = 3000L, minPts = 3L).collect()
    }
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getString(3) == "core", s"blob member ${r.getLong(0)} not core")
      assert(r.getLong(4) == 1L, "blob must be one cluster labeled by min id")
    }
    assertNoCartesian(plans, "dbscan packed cell")
  }

  test("hotspot single packed cell: lone spike scores hot, background does not, no data-sized cartesian") {
    // 500 points in one cell + a sparse uniform background (1 point per
    // distant cell): the packed cell's 3x3 ring is anomalously dense and
    // must flag hot; background cells must not
    val spike = (1L to 500L).map(i => (50000.0 + (i % 10), 50000.0 + (i % 7)))
    val background = (1L to 60L)
      .map(i => (1000000.0 + i * 300000.0, 1000000.0 + (i * 7 % 60) * 300000.0))
    val pts = (spike ++ background).toDF("x", "y")
    val (rows, plans) = withPlans {
      graft.operators.Geo.gridHotspotsOf(pts, cell = 100000.0, hotZ = 2.0)
        .collect()
    }
    val byCell = rows.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getLong(2), r.getInt(6)))).toMap
    assert(byCell((0L, 0L))._1 == 500L, "spike cell count")
    assert(byCell((0L, 0L))._2 == 1, "packed cell must flag hot")
    val hotElsewhere = byCell.filter { case (c, (_, hot)) => c != (0L, 0L) && hot == 1 }
    assert(hotElsewhere.isEmpty, s"background cells flagged hot: $hotElsewhere")
    // the only cross joins in the hotspot plan broadcast 1-row/9-row
    // frames (global moments, ring offsets); a data-sized cartesian is
    // the degenerate shape
    assertNoCartesian(plans, "hotspot spike")
  }

  test("nearest join corner layout: explode stays bounded, covering round broadcasts") {
    // all probes clustered in one EMPTY corner ~1000 cells from the point
    // blob: every pre-covering ring misses the point bbox entirely (the
    // clamped span must generate ZERO cells), and the covering round must
    // broadcast the stragglers instead of exploding — the r12 shape
    // generated (2·rCover+1)² ≈ 4.2M ring cells per straggler here
    val ptRows = (1L to 50L).map(i => (i, (i % 8).toDouble, (i % 7).toDouble))
    val probeRows = (1L to 30L).map(i =>
      (i, 10000.0 + (i % 5), 10000.0 + (i % 6)))
    val pts = ptRows.toDF("o_orderkey", "x", "y")
    val probes = probeRows.toDF("s_suppkey", "px", "py")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan)
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
    val brute = probeRows.map { case (s, px, py) =>
      val (ok, d2) = ptRows.map { case (o, x, y) =>
        (o, ((x - px) * (x - px) + (y - py) * (y - py)).toLong) }
        .minBy { case (o, d) => (d, o) }
      (s, ok, d2)
    }.toSet
    assert(got == brute, "corner layout diverged from brute force")
    import scala.jdk.CollectionConverters._
    val all = plans.asScala.toSeq
    assert(all.nonEmpty, "listener captured no plans")
    all.foreach(p => assert(!p.toString.contains("CartesianProduct"),
      s"cartesian in the nearest path:\n${p.toString.take(1500)}"))
    // sum every GenerateExec's (explode's) output rows across every
    // executed plan, descending through AQE wrappers and query stages
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(s.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val exploded = all.flatMap(flatten).collect {
      case g: org.apache.spark.sql.execution.GenerateExec =>
        g.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }.sum
    assert(exploded == 0L,
      s"out-of-reach rings must generate zero cells, got $exploded")
  }

  test("salted join 95%-one-key layout: result equals the plain join, shuffle key carries the salt") {
    // hostile skew: 95% of the fact side lands on join_key 0. The salted
    // join must (a) stay result-identical to the plain unsalted join and
    // (b) actually shuffle on (join_key, salt) — the mechanics that
    // spread the hot key over S partitions. Broadcast is disabled so the
    // join cannot sidestep the shuffle it exists to balance.
    val ev = (1L to 2000L).map { i =>
      val key = if (i % 20 != 0) 0L else i            // 95% on key 0
      (key, i, if (i % 3 == 0) "purchase" else "view")
    }.toDF("join_key", "event_id", "event_type")
    val dim = ev.select(col("join_key")).distinct()
      .withColumn("score", (col("join_key") * 7) % 100)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (rows, plans) = try {
      withPlans {
        graft.operators.Relational.saltedJoinOver(ev, dim, salts = 16)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // the plain unsalted join, computed independently
    val plain = ev.join(dim, Seq("join_key"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("score")).cast("long").as("sum_score"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == plain, s"salted result diverged from the plain join:\n$rows\n$plain")
    assertNoCartesian(plans, "salted join")
    // the executed join must key on BOTH join_key and salt — a refactor
    // that drops the salt from the equi key silently re-concentrates the
    // hot key into one partition and this assertion is what would catch it
    val joinLines = plans.flatMap(_.linesIterator)
      .filter(l => l.contains("Join") && l.contains("join_key"))
    assert(joinLines.nonEmpty, "no join on join_key found in any executed plan")
    assert(joinLines.exists(l => l.contains("salt")),
      s"no executed join keys on the salt:\n${joinLines.mkString("\n")}")
  }

  test("fuzzy match stop-gram catalog: df-cap bounds candidates, rare grams still match") {
    // hostile catalog: every clean name shares the prefix 'commonhead'
    // (a stop-gram factory) but ends in a distinctive rare tail; dirty
    // names tweak one character. Uncapped blocking is |dirty| x |clean|;
    // the df-cap must collapse it to the rare-tail blocks without losing
    // the true matches.
    val clean = (1 to 200)
      .map(i => f"commonhead tail$i%03d").toDF("clean_name")
    val dirty = (1 to 200)
      .map(i => (i.toLong, f"commonheadXtail$i%03d")).toDF("key", "dirty_name")
    val capped = graft.operators.Staging
      .fuzzyCandidates(clean, dirty, dfCap = 16).count()
    val uncapped = graft.operators.Staging
      .fuzzyCandidates(clean, dirty, dfCap = Int.MaxValue).count()
    assert(uncapped == 200L * 200L,
      s"hostile catalog should block all pairs uncapped, got $uncapped")
    // rare tail grams (df ~ 1-2 across 'tailNNN') bound the capped set:
    // well under quadratic
    assert(capped <= 2000L, s"df-cap failed to bound candidates: $capped")
    // and the capped match still lands every true pair exactly
    val matched = graft.operators.Staging
      .fuzzyMatchOver(clean, dirty, maxDist = 2, dfCap = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!matched.contains("UNMATCHED"), s"df-cap lost true matches: $matched")
    assert(matched.values.sum == 200L && matched.forall(_._2 == 1L),
      "every dirty record must match its own clean name")
  }

  test("eval/drift degenerate layouts: single-day, single-value and one-arm corpora stay consistent") {
    import spark.implicits._
    // MK/CUPED drop a group ONLY when both engines would (inner joins on
    // both sides); PSI must stay finite with an empty window
    val oneDay = Seq(("solo", 5L, 100L), ("solo", 5L, 200L))
      .toDF("source", "day", "md")
    // a single-day source has no pairs: the pair join drops it on BOTH
    // engines — it must vanish, not crash or half-appear
    assert(graft.operators.LoadOps.mannKendallOf(oneDay).collect().isEmpty,
      "single-day source must drop from MK (no pairs on either engine)")
    // PSI single-day: the whole mass lands in the current window; Laplace
    // smoothing keeps the score finite, and a constant single value
    // occupies exactly one bin
    val psiRows = graft.operators.LoadOps.psiOf(
      Seq(("solo", 5L, 100L), ("solo", 5L, 100L)).toDF("source", "day", "cents"))
      .collect()
    assert(psiRows.length == 1)
    assert(psiRows(0).getLong(1) == 0L && psiRows(0).getLong(2) == 2L,
      "single day = empty base window")
    assert(!psiRows(0).isNullAt(3) && !psiRows(0).getDouble(3).isNaN,
      "smoothed PSI must stay finite on an empty base")
    // CUPED one-arm group: inner a/b join drops it, matching the oracle
    val oneArm = Seq(("solo", 2L, 0L, 100L), ("solo", 2L, 3L, 200L),
      ("solo", 4L, 0L, 100L), ("solo", 4L, 3L, 200L))
      .toDF("event_type", "user_id", "day", "cents")
    assert(graft.operators.Relational.cupedOf(oneArm).collect().isEmpty,
      "one-arm group must drop from CUPED (inner join on both engines)")
    // CUPED zero pre-variance: theta/rho2 NULL via nullif, diffs survive
    val flatPre = Seq(("f", 1L, 0L, 100L), ("f", 1L, 3L, 300L),
      ("f", 2L, 0L, 100L), ("f", 2L, 3L, 500L))
      .toDF("event_type", "user_id", "day", "cents")
    val fp = graft.operators.Relational.cupedOf(flatPre).collect()(0)
    assert(fp.isNullAt(3) && fp.isNullAt(6), "flat pre must NULL theta/rho2")
    assert(fp.getDouble(4) == 200.0, "raw diff must survive a flat pre")
  }
}
