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

  test("gaps-islands: planted calendars produce closed-form streaks and the corpus run replays brute-force") {
    import spark.implicits._
    // u1: {1,2,3} + {7,8} + {10} (day 2 duplicated — the core must dedupe);
    // u2: one unbroken 4-day run; u3: a single active day
    val planted = Seq(
      (1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L), (1L, 10L),
      (2L, 5L), (2L, 6L), (2L, 7L), (2L, 8L),
      (3L, 42L)).toDF("user_id", "day")
    val hist = Relational.gapsIslandsOf(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(hist == Map(
      1L -> ((1L, 1L, 1L)),   // u3: longest 1, one island, one active day
      3L -> ((1L, 3L, 6L)),   // u1: longest 3, three islands, six active days
      4L -> ((1L, 1L, 4L))),  // u2: longest 4, one island, four active days
      s"planted histogram wrong: $hist")
    // corpus run: replay brute-force from raw events
    val got = Relational.qGapsIslands(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val days = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec div 86400 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val brute = days.groupBy(_._1).map { case (_, ds) =>
      val sorted = ds.map(_._2).distinct.sorted
      val lens = sorted.zipWithIndex
        .groupBy { case (d, i) => d - i }.values.map(_.size.toLong).toSeq
      (lens.max, lens.size.toLong, sorted.size.toLong)
    }.toSeq.groupBy(_._1).map { case (streak, us) =>
      (streak, us.size.toLong, us.map(_._2).sum, us.map(_._3).max)
    }.toSeq.sortBy(_._1)
    assert(got.nonEmpty && got == brute, "corpus histogram must replay brute-force")
  }

  test("rfm: brute-force quintile replay, score ranges, segment naming consistency") {
    val got = Relational.qRfm(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    // brute replay from raw orders: same integer metrics, same
    // inverse-CDF boundaries ((k·n+4)/5 ceil), same boundary-tie rule
    val orders = Tables(spark, sfDir).orders
      .selectExpr("o_custkey",
        "cast(datediff(to_date(o_orderdate), date'1970-01-01') as long) as day",
        "cast(round(o_totalprice * 100) as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = orders.groupBy(_._1).map { case (k, os) =>
      (k, os.map(_._2).max, os.size.toLong, os.map(_._3).sum)
    }.toSeq
    val corpusDay = cust.map(_._2).max
    val metrics = cust.map { case (k, last, freq, cents) =>
      (k, corpusDay - last, freq, cents / 100, cents)
    }
    val n = metrics.size.toLong
    def bks(vs: Seq[Long]): Seq[Long] = {
      val cells = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val cum = cells.scanLeft(0L)(_ + _._2).tail
      (1 to 4).map { k =>
        val t = (k * n + 4) / 5
        cells(cum.indexWhere(_ >= t))._1
      }
    }
    val (rb, fb, mb) =
      (bks(metrics.map(_._2)), bks(metrics.map(_._3)), bks(metrics.map(_._4)))
    def up(v: Long, b: Seq[Long]) = 1 + b.count(v > _)
    val brute = metrics.map { case (_, rec, freq, dol, cents) =>
      val (r, f, m) = (6 - up(rec, rb), up(freq, fb), up(dol, mb))
      val seg =
        if (r >= 4 && f >= 4 && m >= 4) "champions"
        else if (r <= 2 && f >= 4) "lapsed_loyal"
        else if (r >= 4 && f <= 2) "recent_light"
        else "mid"
      ((r, f, m, seg), cents)
    }.groupBy(_._1).map { case ((r, f, m, seg), g) =>
      (r, f, m, seg, g.size.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    assert(got.nonEmpty && got == brute, "RFM cells must replay brute-force")
    assert(got.map(_._5).sum == n, "every customer lands in exactly one cell")
    got.foreach { case (r, f, m, _, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
  }

  test("gini: all-equal scores exactly zero, one whale scores (n-1)/n, bimodal matches the closed form") {
    import spark.implicits._
    val vals = ((1 to 10).map(_ => ("eq", 50L)) ++
      (1 to 9).map(_ => ("whale", 0L)) ++ Seq(("whale", 1000L)) ++
      (1 to 5).map(_ => ("two", 100L)) ++ (1 to 5).map(_ => ("two", 300L)))
      .toDF("seg", "v")
    val got = Relational.giniOf(vals).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("eq") == ((10L, 500L, 0.0)), s"all-equal: ${got("eq")}")
    assert(got("whale") == ((10L, 1000L, 0.9)), s"one whale: ${got("whale")}")
    // half at 100, half at 300: mean abs diff 100, mean 200 → G = 0.25
    assert(got("two") == ((10L, 2000L, 0.25)), s"bimodal: ${got("two")}")
    // live wire: coefficients in [0, 1), segments partition the customers
    val wire = Relational.qGini(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(wire.nonEmpty && wire.forall(w => w._3 >= 0.0 && w._3 < 1.0))
  }

  test("abc: whale/bimodal segments classify by exact integer boundaries, classes partition spend") {
    import spark.implicits._
    // w: 800/150/50 → the 800-whale alone is A (cumb 0), 150 lands B
    // (cumb 800: 5·800 = 4000 is NOT < 4·1000 strict), 50 lands C
    // (cumb 950: 20·950 = 19000 is NOT < 19·1000); eq: one shared cell,
    // cumb 0 → everyone A
    val vals = (Seq(("w", 800L), ("w", 150L), ("w", 50L)) ++
      (1 to 10).map(_ => ("eq", 10L))).toDF("seg", "v")
    val got = Relational.abcOf(vals).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("w", "A")) == ((1L, 800L, 800000L)), s"${got.get(("w", "A"))}")
    assert(got(("w", "B")) == ((1L, 150L, 150000L)))
    assert(got(("w", "C")) == ((1L, 50L, 50000L)))
    assert(got(("eq", "A")) == ((10L, 100L, 1000000L)) && !got.contains(("eq", "B")),
      "equal spenders share one cell and one class")
    // live wire: classes partition customers and dollars within segment
    val wire = Relational.qAbc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(wire.nonEmpty)
    wire.groupBy(_._1).foreach { case (seg, rows) =>
      val ppm = rows.map(_._5).sum
      assert(ppm >= 999998L && ppm <= 1000000L, s"$seg shares: $ppm") // div-floor slack
      val aShare = rows.filter(_._2 == "A").map(_._5).sum
      assert(aShare >= 800000L || rows.map(_._2).toSet == Set("A"),
        s"$seg: class A must cover at least 80% once it closes: $aShare")
    }
  }

  test("decile lift: brute-force CDF replay, rates weighted-average to base, deciles cover users") {
    val got = Relational.qDecileLift(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val users = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        (es.size.toLong, if (es.exists(_._2 == "purchase")) 1L else 0L)
      }
    val n = users.size.toLong
    val cells = users.map(_._1).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val cum = cells.scanLeft(0L)(_ + _._2).tail
    val bks = (1 to 9).map { k =>
      val t = (k * n + 9) / 10
      cells(cum.indexWhere(_ >= t))._1
    }
    val (nTot, cTot) = (n, users.map(_._2).sum)
    val brute = users.map { case (ne, cv) => (1 + bks.count(ne > _), cv) }
      .groupBy(_._1).map { case (d, g) =>
        val (nu, nc) = (g.size.toLong, g.map(_._2).sum)
        val ppm = nc * 1000000L / nu
        (d, nu, nc, ppm, ppm * 1000000L / (cTot * 1000000L / nTot))
      }.toSeq.sortBy(_._1)
    assert(got.nonEmpty && got == brute, "decile table must replay brute-force")
    assert(got.map(_._2).sum == nTot && got.map(_._3).sum == cTot,
      "deciles must cover every user and every conversion")
  }

  test("basket lift: brute pair replay, symmetry of support, independence bound sanity") {
    val got = Relational.qBasketLift(spark, sfDir, minSupport = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val t = Tables(spark, sfDir)
    val inc = t.lineitem.select("l_orderkey", "l_partkey")
      .join(t.part.selectExpr("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "p_brand").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = inc.map(_._1).distinct.size.toLong
    val per = inc.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val brute = inc.groupBy(_._1).values.toSeq
      .flatMap { basket =>
        val bs = basket.map(_._2).distinct.sorted
        for (i <- bs.indices; j <- i + 1 until bs.size) yield (bs(i), bs(j))
      }
      .groupBy(identity).toSeq
      .collect { case ((a, b), g) if g.size >= 2 =>
        val nab = g.size.toLong
        (a, b, nab, per(a), per(b), nab * 1000000L / per(a) * nOrders / per(b))
      }.sortBy(x => (x._1, x._2))
    assert(got.nonEmpty && got == brute, "basket matrix must replay brute-force")
    got.foreach { case (a, b, nab, na, nb, _) =>
      assert(nab <= math.min(na, nb), s"support exceeds marginals for ($a, $b)")
    }
  }

  test("churn hazard: at-risk sets telescope, hazards replay brute-force, final cohort churns fully") {
    val got = Relational.qChurnHazard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val life = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec div 86400 div 7 as w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (_, ws) =>
        ws.map(_._2).max - ws.map(_._2).min
      }
    val cells = life.groupBy(identity).toSeq
      .map { case (k, g) => (k, g.size.toLong) }.sortBy(_._1)
    val brute = cells.map { case (k, churned) =>
      val atRisk = cells.filter(_._1 >= k).map(_._2).sum
      (k, atRisk, churned, churned * 1000000L / atRisk)
    }
    assert(got.nonEmpty && got == brute, "hazard curve must replay brute-force")
    // at-risk telescopes: each row's at-risk = next row's + its churned
    got.sliding(2).foreach {
      case Seq((_, r1, c1, _), (_, r2, _, _)) =>
        assert(r1 == r2 + c1, "at-risk must telescope")
      case _ =>
    }
    assert(got.last._2 == got.last._3 && got.last._4 == 1000000L,
      "the longest-lived cohort churns fully at its last week")
  }

  test("new vs returning: brute weekly replay, first week all-new, news sum to the user count") {
    val got = Relational.qNewVsReturning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val uw = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec div 86400 div 7 as week")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val first = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val brute = uw.groupBy(_._2).toSeq.map { case (wk, us) =>
      val nNew = us.count { case (u, w) => first(u) == w }.toLong
      val nAct = us.size.toLong
      (wk, nAct, nNew, nAct - nNew, (nAct - nNew) * 1000000L / nAct)
    }.sortBy(_._1)
    assert(got.nonEmpty && got == brute, "weekly split must replay brute-force")
    assert(got.head._2 == got.head._3, "the corpus's first week is all-new by definition")
    assert(got.map(_._3).sum == first.size.toLong,
      "every user is new in exactly one week")
  }

  test("attribution: brute path replay, model totals agree, purchase-first users drop") {
    val got = Relational.qAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "event_type", "sec", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    implicit val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
    val byUser = ev.groupBy(_._1)
    val paths: Seq[Seq[String]] = byUser.toSeq.flatMap { case (_, es) =>
      val purchases = es.filter(_._2 == "purchase").map(e => (e._3, e._4)).sorted
      purchases.headOption.flatMap { ck =>
        val touches = es.filter(e => ord.lt((e._3, e._4), ck))
          .sortBy(e => (e._3, e._4)).map(_._2).toSeq
        if (touches.isEmpty) None else Some(touches)
      }
    }
    val channels = paths.flatten.distinct ++
      paths.map(_.head) ++ paths.map(_.last)
    val brute = channels.distinct.sorted.map { ch =>
      (ch,
        paths.map(p => p.count(_ == ch).toLong * (1000000L / p.size)).sum,
        paths.count(_.head == ch).toLong,
        paths.count(_.last == ch).toLong)
    }
    assert(got.nonEmpty && got == brute, "attribution must replay brute-force")
    assert(got.map(_._3).sum == paths.size && got.map(_._4).sum == paths.size,
      "first/last models each hand out exactly one credit per conversion")
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

  test("windowed funnel: per-user brute replay, monotone cohorts, delays within the window") {
    val W = 86400L
    val got = Relational.qFunnelWindowed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val ev = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "event_type", "sec").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).values.flatMap { g =>
      val vs = g.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else {
        val v = vs.min
        val c = g.filter(e => e._2 == "click" && e._3 >= v && e._3 <= v + W)
          .map(_._3).minOption
        val p = c.flatMap(cs => g.filter(e =>
          e._2 == "purchase" && e._3 >= cs && e._3 <= cs + W).map(_._3).minOption)
        Some((v, c, p))
      }
    }.toSeq
    val nView = perUser.length.toLong
    val nClick = perUser.count(_._2.isDefined).toLong
    val nPurch = perUser.count(_._3.isDefined).toLong
    val cds = perUser.collect { case (v, Some(c), _) => c - v }.sum
    val pds = perUser.collect { case (_, Some(c), Some(p)) => p - c }.sum
    val brute = Seq(
      (1L, "view", nView, 1000000L, 0L),
      (2L, "click", nClick, nClick * 1000000L / math.max(nView, 1L), cds),
      (3L, "purchase", nPurch, nPurch * 1000000L / math.max(nClick, 1L), pds))
    assert(got == brute, s"funnel diverged:\n$got\nvs\n$brute")
    // structure: cohorts shrink monotonically, conversions are ≤ 1e6 PPM,
    // and every converted step's mean delay fits inside the window
    assert(nView >= nClick && nClick >= nPurch && nView > 0)
    assert(got.forall(_._4 <= 1000000L))
    if (nClick > 0) assert(cds <= nClick * W)
    if (nPurch > 0) assert(pds <= nPurch * W)
    // the window BITES: some user clicks only outside the window (the
    // unwindowed funnel would count them)
    val unwindowed = ev.groupBy(_._1).values.count { g =>
      val vs = g.filter(_._2 == "view").map(_._3)
      vs.nonEmpty && g.exists(e => e._2 == "click" && e._3 >= vs.min) &&
        !g.exists(e => e._2 == "click" && e._3 >= vs.min && e._3 <= vs.min + W)
    }
    assert(unwindowed > 0, "window never binds — widen the test or shrink W")
  }

  test("ab ttest: brute-force moments replay, arm swap negates t, verdict consistent") {
    val got = Relational.qAbTtest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getInt(8)))
      .toSeq
    val ev = Tables(spark, sfDir).events
      .selectExpr("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (et, nA, nB, mA, mB, vA, vB, t, sig) =>
      val (a, b) = ev.filter(_._1 == et).partition(_._2 % 2 == 0)
      assert(nA == a.length.toLong && nB == b.length.toLong, s"$et arm sizes")
      def mean(xs: Array[(String, Long, Double)]) = xs.map(_._3).sum / xs.length
      def vars(xs: Array[(String, Long, Double)]) = {
        val m = mean(xs)
        xs.map(x => (x._3 - m) * (x._3 - m)).sum / (xs.length - 1)
      }
      assert(math.abs(mA - mean(a)) < 1e-3 && math.abs(mB - mean(b)) < 1e-3,
        s"$et arm means off")
      assert(math.abs(vA - vars(a)) < 1e-2 && math.abs(vB - vars(b)) < 1e-2,
        s"$et arm variances off")
      // t from the ROUNDED moments — the exact engine contract
      val want = r4((mA - mB) / math.sqrt(vA / nA + vB / nB))
      assert(t == want, s"$et t_stat $t != $want from rounded moments")
      assert(sig == (if (math.abs(t) >= 1.96) 1 else 0), s"$et verdict")
      // symmetry: swapping the arms must exactly negate the statistic
      val swapped = r4((mB - mA) / math.sqrt(vB / nB + vA / nA))
      assert(math.abs(swapped + want) < 1e-9, s"$et arm swap not antisymmetric")
    }
    assert(got.nonEmpty && got.map(_._1).distinct.length == got.length)
  }

  test("regression: OLS fit replays from brute moments and the fit is exact from rounded inputs") {
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Relational.qRegression(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    val rows = Tables(spark, sfDir).lineitem
      .selectExpr("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (flag, n, mx, my, slope, intercept, r2) =>
      val g = rows.filter(_._1 == flag)
      assert(n == g.length.toLong, s"$flag group size")
      // brute moments (independent float fold → tolerance on the moments)
      val (bx, by) = (g.map(_._2), g.map(_._3))
      val (bmx, bmy) = (bx.sum / n, by.sum / n)
      val vx = bx.map(x => (x - bmx) * (x - bmx)).sum / (n - 1)
      val vy = by.map(y => (y - bmy) * (y - bmy)).sum / (n - 1)
      val cxy = g.map(t => (t._2 - bmx) * (t._3 - bmy)).sum / (n - 1)
      assert(math.abs(mx - bmx) < 1e-3 && math.abs(my - bmy) < 1e-2, s"$flag means off")
      // the fit is EXACT arithmetic over the published rounded moments —
      // recover them from the engine's own output shape
      val wantSlope = r4(r4(cxy) / r4(vx))
      assert(math.abs(slope - wantSlope) < 2e-4, s"$flag slope $slope != $wantSlope")
      assert(math.abs(intercept - r4(my - (r4(cxy) / r4(vx)) * mx)) < 2e-3,
        s"$flag intercept")
      val wantR2 = r4(r4(cxy) * r4(cxy) / (r4(vx) * r4(vy)))
      assert(math.abs(r2 - wantR2) < 2e-4 && r2 >= 0.0 && r2 <= 1.0, s"$flag r2")
      // the fit line passes through the group centroid by construction
      assert(math.abs((slope * mx + intercept) - my) < 2e-2,
        s"$flag fit must pass through (mean_x, mean_y)")
    }
  }

  test("set ops all: multiset identities hold — min/max-difference multiplicities per value") {
    val got = Relational.qSetOpsAll(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    // brute multiset counts per side
    val rows = Tables(spark, sfDir).orders
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ca = rows.filter(_._1 % 3 == 0).groupBy(t => (t._2, t._3))
      .view.mapValues(_.length.toLong).toMap
    val cb = rows.filter(_._1 % 2 == 0).groupBy(t => (t._2, t._3))
      .view.mapValues(_.length.toLong).toMap
    val keys = (ca.keySet ++ cb.keySet).toSeq
    keys.foreach { case k @ (s, p) =>
      val inter = math.min(ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))
      val excpt = math.max(0L, ca.getOrElse(k, 0L) - cb.getOrElse(k, 0L))
      assert(got.getOrElse(("intersect_all", s, p), 0L) == inter,
        s"$k intersect_all multiplicity")
      assert(got.getOrElse(("except_all", s, p), 0L) == excpt,
        s"$k except_all multiplicity")
    }
    // bag semantics genuinely differ from the distinct form somewhere
    assert(got.exists { case ((op, _, _), n) => op == "intersect_all" && n > 1L },
      "no duplicate survived — ALL variants untested against DISTINCT")
  }

  test("hierarchy rollup: pointer jumping equals a sequential parent walk over the whole forest") {
    val got = Relational.qHierarchyRollup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // independent replay: the naive one-step parent walk per node
    val nodes = Tables(spark, sfDir).customer
      .selectExpr("c_custkey", "cast(round(c_acctbal * 100) as long)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def parent(k: Long) = if (k < 16L) k else k / 2L
    val walked = nodes.map { case (id, cents) =>
      var cur = id; var d = 0L
      while (parent(cur) != cur) { cur = parent(cur); d += 1 }
      (cur, id, d, cents)
    }
    val brute = walked.groupBy(_._1).toSeq.map { case (root, g) =>
      (root, g.length.toLong, g.map(_._3).max, g.map(_._4).sum)
    }.sortBy(_._1)
    assert(got == brute, s"hierarchy rollup diverged:\n$got\nvs\n$brute")
    // the forest is genuinely deep (doubling had real work to do) and
    // every node lands in exactly one tree
    assert(got.map(_._3).max >= 3L, "forest too shallow to exercise doubling")
    assert(got.map(_._2).sum == nodes.length.toLong, "trees must partition the nodes")
  }
  test("mann-whitney: hand-ranked midranks with ties, tie-corrected z, all-tied NULL guard") {
    import spark.implicits._
    // arm A (even users) = [1, 2, 2], arm B = [2, 3]: midranks 1 / 3,3,3 / 5,
    // R_A = 7, U = 1, tie-sum = 24, sigma^2 = 0.5*(6 - 24/20) = 2.4
    val ev = Seq(
      ("m", 0L, 1.0), ("m", 2L, 2.0), ("m", 4L, 2.0),
      ("m", 1L, 2.0), ("m", 3L, 3.0),
      ("c", 0L, 5.0), ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0))
      .toDF("event_type", "user_id", "value")
    val got = Relational.mannWhitneyOf(ev).collect()
    val m = got.find(_.getString(0) == "m").get
    assert(m.getLong(1) == 3L && m.getLong(2) == 2L)
    assert(m.getDouble(3) == 1.0, s"u = ${m.getDouble(3)}")
    val sigma = math.sqrt(3.0 * 2.0 / 12.0 * (6.0 - 24.0 / 20.0))
    val expZ = BigDecimal((1.0 - 3.0) / sigma)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getDouble(4) == expZ, s"z = ${m.getDouble(4)} vs $expZ")
    assert(m.getInt(5) == 0, "below the 1.96 bar")
    val c = got.find(_.getString(0) == "c").get
    assert(c.isNullAt(4) && c.isNullAt(5), "all-tied group must report NULL z")
  }

  test("auc-roc: hand-ranked wire with ties equals pair counting, single-class NULL guard") {
    import spark.implicits._
    // negatives [1, 2, 2], positives [2, 3]: pair count = (pos 2 beats
    // neg 1) + 2 half-ties + (pos 3 beats all 3) = 5 of 6 → AUC 5/6
    val ev = Seq(
      ("m", 1L, 0L), ("m", 2L, 0L), ("m", 2L, 0L),
      ("m", 2L, 1L), ("m", 3L, 1L),
      ("c", 5L, 1L), ("c", 7L, 1L))
      .toDF("source", "cents", "pos")
    val got = Relational.aucRocOf(ev).collect()
    val m = got.find(_.getString(0) == "m").get
    assert(m.getLong(1) == 2L && m.getLong(2) == 3L, "class counts")
    assert(m.getDouble(3) == BigDecimal(5.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"auc = ${m.getDouble(3)}")
    assert(m.getInt(4) == 1, "5/6 clears the 0.02 separation bar")
    val c = got.find(_.getString(0) == "c").get
    assert(c.isNullAt(3) && c.isNullAt(4), "single-class group must be NULL")
    // perfect and inverted rankings hit the AUC extremes exactly
    val extremes = Seq(("p", 1L, 0L), ("p", 2L, 0L), ("p", 3L, 1L),
      ("i", 1L, 1L), ("i", 2L, 1L), ("i", 3L, 0L))
      .toDF("source", "cents", "pos")
    val ex = Relational.aucRocOf(extremes).collect()
    assert(ex.find(_.getString(0) == "p").get.getDouble(3) == 1.0)
    assert(ex.find(_.getString(0) == "i").get.getDouble(3) == 0.0)
  }

  test("srm: balanced split passes, planted one-arm group pages, duplicate events count once") {
    import spark.implicits._
    val ev = ((1L to 30L).map(u => ("ok", u)) ++
      (1L to 20L).map(u => ("bad", u * 2L)) ++
      (1L to 20L).map(u => ("bad", u * 2L)))  // exact duplicates
      .toDF("event_type", "user_id")
    val got = Relational.srmOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))).toMap
    assert(got("ok") == ((15L, 15L, 0L, 0)), "balanced split must pass")
    // all 20 units even: chi2 = 400*10000/20 = 200000 (20.0), pages
    assert(got("bad") == ((20L, 0L, 200000L, 1)), "one-arm group must page")
  }

  test("cuped: closed-form theta/rho2, perfect predictor zeroes the adjusted diff, arm-skewed pre shifts it") {
    import spark.implicits._
    // 'skew': post = 2*pre + 500*arm, arms UNbalanced in pre (pooled
    // theta absorbs part of the effect: theta 3, adj diff 400 not 500);
    // 'bal': post = 2*pre exactly, arms balanced (rho2 = 1, adj diff 0)
    val ev = Seq(
      ("skew", 1L, 0L, 100L), ("skew", 1L, 3L, 200L),
      ("skew", 2L, 0L, 200L), ("skew", 2L, 3L, 900L),
      ("skew", 3L, 0L, 300L), ("skew", 3L, 3L, 600L),
      ("skew", 4L, 0L, 400L), ("skew", 4L, 3L, 1300L),
      ("bal", 1L, 0L, 100L), ("bal", 1L, 3L, 200L),
      ("bal", 2L, 0L, 100L), ("bal", 2L, 3L, 200L),
      ("bal", 3L, 0L, 200L), ("bal", 3L, 3L, 400L),
      ("bal", 4L, 0L, 200L), ("bal", 4L, 3L, 400L))
      .toDF("event_type", "user_id", "day", "cents")
    val got = Relational.cupedOf(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val sk = got("skew")
    assert(sk.getLong(1) == 2L && sk.getLong(2) == 2L)
    assert(sk.getDouble(3) == 3.0, s"theta ${sk.getDouble(3)}")
    assert(sk.getDouble(4) == 700.0 && sk.getDouble(5) == 400.0,
      s"raw/adj diff ${sk.getDouble(4)}/${sk.getDouble(5)}")
    assert(sk.getDouble(6) ==
      BigDecimal(600000.0 * 600000.0 / (200000.0 * 2600000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"rho2 ${sk.getDouble(6)}")
    // adjusted values y − 3x per arm: a = {300, 100}, b = {−100, −300}
    // → va = vb = 20000, t = 400/√20000 = 2.8284, pages
    assert(sk.getDouble(7) == BigDecimal(400.0 / math.sqrt(20000.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"t_adj ${sk.getDouble(7)}")
    assert(sk.getInt(8) == 1, "the adjusted verdict must page")
    val bl = got("bal")
    assert(bl.getDouble(3) == 2.0 && bl.getDouble(6) == 1.0,
      "perfect predictor: theta 2, rho2 1")
    assert(bl.getDouble(4) == 0.0 && bl.getDouble(5) == 0.0,
      "no effect must stay zero")
    // zero adjusted variance: the Welch t is undefined, NULL not Inf
    assert(bl.isNullAt(7) && bl.isNullAt(8),
      "zero adjusted variance must NULL the verdict")
  }

  test("power mde: closed-form wire, multi-event users aggregate first, degenerate groups NULL") {
    import spark.implicits._
    // 'm': user totals 100/200/300/400 (user 3's total arrives as two
    // events — the unit agg must fold them BEFORE the moments)
    val ev = Seq(("m", 1L, 100L), ("m", 2L, 200L), ("m", 3L, 150L),
      ("m", 3L, 150L), ("m", 4L, 400L), ("solo", 9L, 500L))
      .toDF("event_type", "user_id", "cents")
    val got = Relational.powerMdeOf(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = got("m")
    assert(m.getLong(1) == 2L && m.getLong(2) == 2L, "arm unit counts")
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = math.sqrt((4.0 * 300000.0 - 1000.0 * 1000.0) / 12.0)
    val mde = 2.8016 * sd * math.sqrt(2.0 / 2.0)
    assert(m.getDouble(3) == 250.0 && m.getDouble(4) == r4(sd),
      s"mean/sd ${m.getDouble(3)}/${m.getDouble(4)}")
    assert(m.getDouble(5) == r4(mde), s"mde ${m.getDouble(5)}")
    assert(m.getDouble(6) == BigDecimal(mde / 250.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a single-unit group has no variance estimate: sd/mde/rel all NULL
    val s = got("solo")
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6),
      "single-unit group must NULL the sd/MDE")
  }

  test("kruskal-wallis: hand-ranked 4-arm wire with ties, tie-corrected H, all-tied NULL guard") {
    import spark.implicits._
    // arms (user_id % 4): a0=[1,2] a1=[2,3] a2=[3,4] a3=[4,5] — midranks
    // 1 / 2.5,2.5 / 4.5,4.5 / 6.5,6.5 / 8; R = 3.5, 7, 11, 14.5;
    // ts = 3·(2³−2) = 18
    val ev = Seq(
      ("m", 0L, 1.0), ("m", 4L, 2.0), ("m", 1L, 2.0), ("m", 5L, 3.0),
      ("m", 2L, 3.0), ("m", 6L, 4.0), ("m", 3L, 4.0), ("m", 7L, 5.0),
      ("c", 0L, 5.0), ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0))
      .toDF("event_type", "user_id", "value")
    val got = Relational.kruskalWallisOf(ev).collect()
    val m = got.find(_.getString(0) == "m").get
    assert((1 to 4).forall(i => m.getLong(i) == 2L), "arm sizes")
    val hRaw = 12.0 / (8.0 * 9.0) *
      (3.5 * 3.5 / 2 + 7.0 * 7.0 / 2 + 11.0 * 11.0 / 2 + 14.5 * 14.5 / 2) -
      3.0 * 9.0
    val expH = BigDecimal(hRaw / (1.0 - 18.0 / 504.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getDouble(5) == expH, s"H = ${m.getDouble(5)} vs $expH")
    assert(m.getDouble(5) > 5.9 && m.getDouble(5) < 6.0 && m.getInt(6) == 0)
    val c = got.find(_.getString(0) == "c").get
    assert(c.isNullAt(5) && c.isNullAt(6), "all-tied group must report NULL H")
  }

  test("top paths: brute 3-gram replay, rank order, shares bounded") {
    val got = Relational.qTopPaths(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    val raw = Tables(spark, sfDir).eventsSec
      .select(col("user_id"), col("event_id"), col("sec"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2)).map(_._4)
      ordered.sliding(3).filter(_.size == 3).map(_.mkString(" > "))
    }
    val total = tris.size.toLong
    val brute = tris.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20).zipWithIndex
      .map { case ((p, n), i) => (i + 1L, p, n, n * 1000000L / total) }
    assert(got == brute, s"paths must replay brute-force: ${got.take(2)} vs ${brute.take(2)}")
    assert(got.map(_._1) == (1L to got.length.toLong), "ranks dense from 1")
    assert(got.map(_._4).sum <= 1000000L, "top-k share cannot exceed the corpus")
    assert(got.sliding(2).forall {
      case Seq(a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2); case _ => true
    }, "rank order is (count DESC, path ASC)")
  }

  test("shape stats: symmetric reads 0 skew, two-point reads -2 kurtosis, all-equal NULLs, brute replay") {
    import spark.implicits._
    // symmetric around 50 → skew exactly 0; a balanced two-point
    // distribution has kurtosis 1 → excess −2 (the theoretical minimum)
    val wires = Seq.fill(10)(("sym", 40L)) ++ Seq.fill(10)(("sym", 60L)) ++
      Seq(("sym", 50L)) ++ Seq.fill(8)(("flat", 7L))
    val got = Relational.shapeStatsOf(wires.toDF("g", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val sym = got("sym")
    assert(sym.getDouble(3) == 0.0, s"symmetric skew: ${sym.getDouble(3)}")
    assert(sym.getDouble(4) < -1.0, s"two-point-ish kurtosis: ${sym.getDouble(4)}")
    assert(got("flat").isNullAt(3) && got("flat").isNullAt(4),
      "all-equal group must report NULL shape")
    // brute replay on the corpus with the same pinned-mean contract
    val gotC = Relational.qShapeStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val raw = Tables(spark, sfDir).eventsSec
      .selectExpr("event_type", "cast(round(value * 100) as long) as v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = raw.groupBy(_._1).toSeq.map { case (g, vs0) =>
      val vs = vs0.map(_._2)
      val n = vs.size.toLong
      val mu = BigDecimal(vs.sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // fold over value cells (the engine's shape), not raw rows
      val cls = vs.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
      def cm(k: Int) = cls.map { case (v, c) => c * math.pow(v - mu, k) }.sum
      val m2 = cm(2) / n
      (g, n, vs.sum / n, r4(cm(3) / n / (m2 * math.sqrt(m2))),
        r4(cm(4) / n / (m2 * m2) - 3.0))
    }.sortBy(_._1)
    gotC.zip(brute).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2 && a._3 == b._3, s"$a vs $b")
      assert(math.abs(a._4 - b._4) <= 1e-4 && math.abs(a._5 - b._5) <= 1e-4,
        s"$a vs $b")
    }
  }

  test("session stats: brute session replay per entry channel, bounce and median contracts") {
    val got = Relational.qSessionStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty)
    // brute replay: rebuild sessions from raw events with the same gap rule
    val raw = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "event_id", "sec", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val sessions = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long, String)]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
      var last = Long.MinValue
      ordered.foreach { e =>
        if (cur.nonEmpty && e._3 - last > 1800L) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
        cur += e; last = e._3
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    def lowerMedian(vs: Seq[Long]): Long = vs.sorted.apply((vs.size + 1) / 2 - 1)
    val brute = sessions.groupBy(_.head._4).toSeq.map { case (entry, ss) =>
      val durs = ss.map(s => s.last._3 - s.head._3)
      val sizes = ss.map(_.size.toLong)
      val bounce = ss.count(_.size == 1).toLong
      (entry, ss.size.toLong, bounce, bounce * 1000000L / ss.size,
        lowerMedian(durs), lowerMedian(sizes), sizes.sum / ss.size)
    }.sortBy(_._1)
    assert(got == brute, s"session stats must replay brute-force: ${got.take(2)} vs ${brute.take(2)}")
    got.foreach { case (e, n, b, ppm, p50d, p50e, me) =>
      assert(b <= n && ppm <= 1000000L, s"$e bounce bounds")
      assert(p50e >= 1L && me >= 1L, s"$e size sanity")
      assert(p50d >= 0L, s"$e duration sanity")
    }
  }

  test("growth accounting: conservation identities, first week all-new, brute replay") {
    val got = Relational.qGrowthAccounting(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got.nonEmpty)
    // WAU_t = new + retained + resurrected, exactly, every week
    got.foreach { case (w, wau, nw, rt, rs, _) =>
      assert(wau == nw + rt + rs, s"week $w composition must sum: $wau != $nw+$rt+$rs")
    }
    // WAU_{t-1} = retained_t + churned_t for consecutive weeks
    got.sliding(2).foreach {
      case Seq(a, b) if b._1 == a._1 + 1 =>
        assert(a._2 == b._4 + b._6,
          s"week ${b._1}: retention identity ${a._2} != ${b._4}+${b._6}")
      case _ => ()
    }
    assert(got.head._2 == got.head._3 && got.head._6 == 0L,
      "the corpus's first week is all-new with zero churn")
    // brute replay from raw cells
    val cells = Tables(spark, sfDir).eventsSec
      .selectExpr("user_id", "sec div 86400 div 7 as week")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = cells.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val firstOf = byUser.view.mapValues(_.min).toMap
    val brute = cells.map(_._2).distinct.sorted.map { w =>
      val active = byUser.filter(_._2.contains(w)).keys.toSeq
      val nw = active.count(u => firstOf(u) == w)
      val rt = active.count(u => byUser(u).contains(w - 1))
      val rs = active.size - nw - rt
      val ch = byUser.count { case (u, ws) => ws.contains(w - 1) && !ws.contains(w) }
      (w, active.size.toLong, nw.toLong, rt.toLong, rs.toLong,
        if (cells.map(_._2).min == w) 0L else ch.toLong)
    }.toSeq
    assert(got == brute, s"growth must replay brute-force")
  }

  test("theil: brute moment replay, decomposition sums to the independent total") {
    val got = Relational.qTheil(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    // brute replay from per-customer spend
    val spend = Tables(spark, sfDir).orders
      .join(Tables(spark, sfDir).customer,
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(round(o_totalprice * 100) as long)) div 100").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(2))).filter(_._2 > 0L)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nn = spend.size.toLong
    val xx = spend.map(_._2).sum
    val brute = spend.groupBy(_._1).toSeq.map { case (seg, vs) =>
      val n = vs.size.toLong; val x = vs.map(_._2).sum
      val sxlnx = vs.map(c => c._2.toDouble * math.log(c._2.toDouble)).sum
      val tg = sxlnx / x - math.log(x.toDouble / n)
      (seg, n, x, x * 1000000L / xx, r4(tg),
        r4(x.toDouble / xx * math.log((x.toDouble / n) / (xx.toDouble / nn))),
        r4(x.toDouble / xx * tg))
    }.sortBy(_._1)
    got.zip(brute).foreach { case (g, b) =>
      assert(g._1 == b._1 && g._2 == b._2 && g._3 == b._3 && g._4 == b._4, s"$g vs $b")
      assert(math.abs(g._5 - b._5) <= 1e-4 && math.abs(g._6 - b._6) <= 1e-4 &&
        math.abs(g._7 - b._7) <= 1e-4, s"$g vs $b")
    }
    // the decomposition identity: Σ between + Σ within = total T
    // (each term rounded 4 → slack 1e-4 per term)
    val sxlnxAll = spend.map(c => c._2.toDouble * math.log(c._2.toDouble)).sum
    val tTotal = sxlnxAll / xx - math.log(xx.toDouble / nn)
    val sumTerms = got.map(g => g._6 + g._7).sum
    assert(math.abs(sumTerms - tTotal) <= 2e-4 * got.size,
      s"decomposition $sumTerms vs total $tTotal")
    got.foreach(g => assert(g._5 >= 0.0, s"Theil is non-negative: $g"))
  }

  test("winsorized: brute boundary replay, robust means sit inside the fences") {
    val got = Relational.qWinsorized(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    val raw = Tables(spark, sfDir).lineitem
      .selectExpr("l_returnflag", "cast(round(l_extendedprice * 100) as long) as v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val brute = raw.groupBy(_._1).toSeq.map { case (flag, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size.toLong
      def pick(target: Long): Long = vs((target - 1).toInt.max(0))
      val lo = pick((n + 19) / 20); val hi = pick((19 * n + 19) / 20)
      val kept = vs.filter(v => v >= lo && v <= hi)
      (flag, n, lo, hi, vs.sum / n,
        vs.map(v => math.min(math.max(v, lo), hi)).sum / n,
        kept.sum / kept.size, n - kept.size)
    }.sortBy(_._1)
    assert(got == brute, s"winsorized must replay brute-force")
    got.foreach { case (f, _, lo, hi, _, wm, tm, _) =>
      assert(lo <= hi, s"$f fences ordered")
      assert(wm >= lo && wm <= hi && tm >= lo && tm <= hi,
        s"$f robust means inside the fences")
    }
  }

  test("kaplan-meier: brute fold replay, curve invariants") {
    val got = Relational.qSurvivalKm(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // independent replay: first touch + lifetime per user from raw rows
    val raw = Tables(spark, sfDir).eventsSec
      .select(col("user_id"), col("event_id"), col("event_type"), col("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val perUser = raw.groupBy(_._1).toSeq.map { case (_, evs) =>
      val first = evs.minBy(e => (e._4, e._2))._3
      val weeks = evs.map(_._4 / 86400 / 7)
      (first, weeks.max - weeks.min)
    }
    val brute = perUser.groupBy(_._1).toSeq.flatMap { case (ch, us) =>
      val cells = us.groupBy(_._2).map { case (k, xs) => (k, xs.size.toLong) }
        .toSeq.sortBy(_._1)
      var atRisk = us.size.toLong
      var s = 1000000L
      cells.map { case (k, d) =>
        val r = atRisk
        s = s * (r - d) / r
        atRisk -= d
        (ch, k, r, d, d * 1000000L / r, s)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == brute, "KM must replay the brute fold")
    // invariants: survival non-increasing per channel, ends at 0 (the
    // last lifetime cell has d = r), hazard within [0, 1e6]
    got.groupBy(_._1).foreach { case (ch, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => b._6 <= a._6; case _ => true
      }, s"$ch survival must be non-increasing")
      assert(sorted.last._6 == 0L, s"$ch curve must end at 0")
      assert(rows.forall(r => r._5 >= 0L && r._5 <= 1000000L))
    }
  }

  test("spearman: brute average-rank replay, monotone planted wire reads rho=1") {
    val got = Relational.qSpearman(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val raw = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        org.apache.spark.sql.functions.expr(
          "cast(round(l_extendedprice * 100) as long)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = raw.groupBy(_._1).toSeq.map { case (flag, rows) =>
      def rank2(vs: Seq[Long]): Map[Long, Long] = {
        val cells = vs.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
          .toSeq.sortBy(_._1)
        var below = 0L
        cells.map { case (v, cnt) =>
          val r = 2L * below + cnt + 1L; below += cnt; (v, r)
        }.toMap
      }
      val rx = rank2(rows.map(_._2).toSeq); val ry = rank2(rows.map(_._3).toSeq)
      val xs = rows.map(r => rx(r._2).toDouble); val ys = rows.map(r => ry(r._3).toDouble)
      val n = xs.length.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      val rho = BigDecimal(cov / (sx * sy))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (flag, rows.size.toLong, rho)
    }.sortBy(_._1)
    got.zip(brute).foreach { case ((f, n, rho), (bf, bn, brho)) =>
      assert(f == bf && n == bn, "group alignment")
      assert(math.abs(rho - brho) <= 1e-4, s"$f rho=$rho brute=$brho")
    }
    // planted wires: strictly monotone → ρ = 1 even though the raw values
    // are wildly non-linear; anti-monotone → ρ = −1
    import spark.implicits._
    val mono = (1 to 50).map(i => ("up", i.toLong, i.toLong * i * i)) ++
      (1 to 50).map(i => ("dn", i.toLong, (1000 - i).toLong))
    val planted = Relational.spearmanOf(mono.toDF("flag", "x", "y"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(planted("up") == 1.0, s"monotone wire: ${planted("up")}")
    assert(planted("dn") == -1.0, s"anti-monotone wire: ${planted("dn")}")
  }
}
