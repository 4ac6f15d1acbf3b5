package graft

import graft.operators.Graph
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** F53 graph_pagerank: an independent Scala replay of the whole pipeline
  * (gram extraction → df-capped edges → the exact integer-PPM recurrence)
  * checked row-for-row against the Spark op on corpora with hand-designed
  * graph structure, plus the two closed-form invariants (isolated node,
  * regular graph).
  */
class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val K = 8
  private val Cap = 32
  private val Iters = 5

  /** Independent reference: sliding word 8-grams, distinct per doc,
    * df-filtered, pair counts, then the floored fixed-point recurrence. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val occ: Seq[(Long, String)] = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(K).filter(_.length == K).map(g => (id, g.mkString(" "))).toSeq.distinct
    }
    val df = occ.groupBy(_._2).view.mapValues(_.size).toMap
    val kept = occ.filter { case (_, g) => df(g) >= 2 && df(g) <= Cap }
    val byGram = kept.groupBy(_._2)
    val edges: Map[(Long, Long), Long] = byGram.values.flatMap { os =>
      for ((a, _) <- os; (b, _) <- os if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outW: Map[Long, Long] =
      edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var pr: Map[Long, Long] = docs.map(d => d._1 -> 1000000L).toMap
    for (_ <- 1 to Iters) {
      val inflow = edges.toSeq
        .map { case ((src, dst), w) => dst -> (pr(src) * w) / outW(src) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = docs.map { case (id, _) =>
        id -> (150000L + (850000L * inflow.getOrElse(id, 0L)) / 1000000L)
      }.toMap
    }
    docs.map { case (id, _) =>
      val nbrs = edges.keys.count(_._1 == id).toLong
      id -> (nbrs, outW.getOrElse(id, 0L), pr(id))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Graph.pagerankOf(docs.toDF("doc_id", "text"), K, Cap, Iters)
      .collect().map { case Row(id: Long, n: Long, w: Long, p: Long) =>
        id -> (n, w, p)
      }.toMap

  private val gramA = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val gramB = "india juliet kilo lima mike november oscar papa"

  test("pagerank matches the independent replay on an asymmetric graph") {
    // doc 0 and 1 share gramA; doc 1 and 2 share gramB; doc 1 ALSO shares
    // gramA's shifted variants with 0 (longer common run → higher weight);
    // doc 3 is isolated
    val docs = Seq(
      0L -> s"$gramA quebec one two three four five six seven eight",
      1L -> s"$gramA romeo $gramB",
      2L -> s"zulu yankee xray whiskey victor uniform tango sierra $gramB",
      3L -> "solo words that no other document repeats at all here okay")
    val exp = brute(docs)
    val got = run(docs)
    assert(got === exp)
    // structure sanity: the hub (doc 1) outranks the leaves
    assert(got(1L)._3 > got(0L)._3)
    assert(got(3L)._1 === 0L)
  }

  test("isolated documents settle at the bare teleport mass") {
    val docs = Seq(
      0L -> "one two three four five six seven eight nine ten",
      1L -> "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")
    val got = run(docs)
    assert(got.values.forall { case (n, w, p) => n == 0L && w == 0L && p == 150000L })
  }

  test("a regular (complete, equal-weight) graph ranks every node equally") {
    // three docs all sharing the SAME single gram → complete K3, w=1 edges
    val docs = Seq(
      0L -> s"$gramA aa bb cc",
      1L -> s"$gramA dd ee ff",
      2L -> s"$gramA gg hh ii")
    val got = run(docs)
    val prs = got.values.map(_._3).toSet
    assert(prs.size === 1)
    val exp = brute(docs)
    assert(got === exp)
  }

  test("corpus-wide boilerplate is excluded by the df cap") {
    // one gram shared by MORE than dfCap docs contributes no edges
    val docs = (0L until (Cap + 5).toLong).map(i => i -> s"$gramA tail$i extra$i")
    val got = run(docs)
    assert(got.values.forall { case (n, w, p) => n == 0L && w == 0L && p == 150000L })
  }

  /** Independent undirected edge set from gram sharing — the naive
    * definition, deliberately NOT the oriented algorithm the engine
    * runs, so the compact-forward orientation is checked against the
    * textbook semantics. */
  private def bruteEdges(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val occ: Seq[(Long, String)] = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(K).filter(_.length == K).map(g => (id, g.mkString(" "))).toSeq.distinct
    }
    val df = occ.groupBy(_._2).view.mapValues(_.size).toMap
    occ.filter { case (_, g) => df(g) >= 2 && df(g) <= Cap }
      .groupBy(_._2).values.flatMap { os =>
        for ((a, _) <- os; (b, _) <- os if a < b) yield (a, b)
      }.toSet
  }

  test("triangles: planted clique + wedge replay against the naive definition") {
    // {0,1,2} all share gramA → K3 (one triangle); 3 shares gramB with 0
    // only (a wedge at 0, no closure); 4 isolated
    val docs = Seq(
      0L -> s"$gramA one two $gramB",
      1L -> s"$gramA three four five six seven eight nine ten",
      2L -> s"$gramA eleven twelve thirteen fourteen fifteen sixteen",
      3L -> s"$gramB seventeen eighteen nineteen twenty twentyone",
      4L -> "nothing shared with anyone else in this corpus at all")
    val und = bruteEdges(docs)
    val nbrs = docs.map { case (id, _) =>
      id -> und.collect { case (a, b) if a == id => b; case (a, b) if b == id => a }
    }.toMap
    val expect = docs.map { case (id, _) =>
      val ns = nbrs(id).toSeq
      val d = ns.length.toLong
      val t = (for (x <- ns; y <- ns if x < y
        if und.contains((math.min(x, y), math.max(x, y)))) yield 1).size.toLong
      val cc = if (d >= 2) t * 2000000L / (d * (d - 1)) else 0L
      id -> (d, t, cc)
    }.toMap
    val got = Graph.trianglesOf(docs.toDF("doc_id", "text"), K, Cap)
      .collect().map { case Row(id: Long, d: Long, t: Long, c: Long) =>
        id -> (d, t, c) }.toMap
    assert(got === expect)
    assert(got(1L) === ((2L, 1L, 1000000L)), "clique corner must be fully clustered")
    assert(got(0L)._2 === 1L && got(0L)._3 < 1000000L,
      "the wedge at 0 must dilute its clustering")
    assert(got(4L) === ((0L, 0L, 0L)))
  }

  test("label propagation: tight communities hold against a weak bridge and replay exactly") {
    // two triangles of heavy mutual overlap (each pair shares MANY
    // grams), bridged by one single shared gram between 2 and 10 — a
    // component-based dedup would fuse them; majority-weight LPA must not
    val run1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val run2 = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    val bridge = "bridge0 bridge1 bridge2 bridge3 bridge4 bridge5 bridge6 bridge7"
    val docs = Seq(
      0L -> s"$run1 zero00", 1L -> s"$run1 one11", 2L -> s"$run1 $bridge",
      10L -> s"$run2 $bridge", 11L -> s"$run2 ten10", 12L -> s"$run2 twelve12")
    // independent replay: weighted synchronous votes, argmax by
    // (weight desc, label asc), isolated/self carry-over
    val occ: Seq[(Long, String)] = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(K).filter(_.length == K).map(g => (id, g.mkString(" "))).toSeq.distinct
    }
    val df = occ.groupBy(_._2).view.mapValues(_.size).toMap
    val w = occ.filter { case (_, g) => df(g) >= 2 && df(g) <= Cap }
      .groupBy(_._2).values.flatMap { os =>
        for ((a, _) <- os; (b, _) <- os if a != b) yield (a, b)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var lbl: Map[Long, Long] = docs.map(d => d._1 -> d._1).toMap
    for (_ <- 1 to 4) {
      lbl = docs.map { case (id, _) =>
        val votes = w.collect { case ((s, t), wt) if s == id => (lbl(t), wt) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toList
        if (votes.isEmpty) id -> lbl(id)
        else id -> votes.minBy { case (l, wt) => (-wt, l) }._1
      }.toMap
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = docs.map { case (id, _) => id -> ((lbl(id), sizes(lbl(id)))) }.toMap
    val got = Graph.labelPropOf(docs.toDF("doc_id", "text"), K, Cap, rounds = 4)
      .collect().map { case Row(id: Long, l: Long, s: Long) => id -> ((l, s)) }.toMap
    assert(got === expect, s"LPA replay diverged: $got vs $expect")
    // the two communities must NOT share a label across the weak bridge
    val left = Set(0L, 1L, 2L).map(got(_)._1)
    val right = Set(10L, 11L, 12L).map(got(_)._1)
    assert(left.size == 1 && right.size == 1 && left != right,
      s"weak bridge fused the communities: $got")
  }

  test("k-core: the planted clique survives, the pendant star peels over two rounds") {
    def gram(tag: String) = (0 until 8).map(j => s"$tag$j").mkString(" ")
    val docs = Seq[(Long, String)](
      (0L, Seq(gram("a01"), gram("a02"), gram("a03")).mkString(" ")),
      (1L, Seq(gram("a01"), gram("a12"), gram("a13")).mkString(" ")),
      (2L, Seq(gram("a02"), gram("a12"), gram("a23")).mkString(" ")),
      (3L, Seq(gram("a03"), gram("a13"), gram("a23")).mkString(" ")),
      (4L, Seq(gram("b45"), gram("b46"), gram("b47")).mkString(" ")),
      (5L, gram("b45")),
      (6L, gram("b46")),
      (7L, gram("b47")),
      (8L, gram("iso")))
    val got = Graph.kcoreOf(docs.toDF("doc_id", "text"), K, Cap, 3, 12)
      .collect().map { case Row(id: Long, deg: Long, rr: Long, ic: Int) =>
        id -> ((deg, rr, ic))
      }.toMap
    // the 4-clique: every member keeps degree 3 among survivors forever
    (0L to 3L).foreach(id => assert(got(id) == ((3L, 0L, 1)), s"doc $id: ${got(id)}"))
    // the star hub survives round 1 on its leaf degree, peels in round 2
    // once the leaves are gone — the multi-round case a single sweep misses
    assert(got(4L) == ((3L, 2L, 0)), s"hub: ${got(4L)}")
    (5L to 7L).foreach(id => assert(got(id) == ((1L, 1L, 0)), s"leaf $id: ${got(id)}"))
    // isolated doc: no edges at all, peels immediately
    assert(got(8L) == ((0L, 1L, 0)), s"isolated: ${got(8L)}")
  }

  test("bfs: hop distances along a planted path, the round cap, the isolated node, and a live wire") {
    import spark.implicits._
    // path 0—1—2—3—4—5 fed as DIRECTED edges one way (the core is given
    // pre-symmetrized edges by the operator; feeding one direction here
    // also proves expansion follows src→dst exactly); 99 isolated
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 99L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = Graph.bfsCore(nodes, edges, seeds, 4)
      .collect().map { case Row(id: Long, hops: Long) => id -> hops }.toMap
    (0L to 4L).foreach(id => assert(got(id) == id, s"node $id: ${got(id)}"))
    // node 5 is 5 hops out — past the 4-round radius by exactly one
    assert(got(5L) == -1L, s"past the cap: ${got(5L)}")
    assert(got(99L) == -1L, s"isolated: ${got(99L)}")
    // the registered kNN wire is non-degenerate: seeds exist, a genuine
    // hop-1+ neighborhood exists, and some vector sits outside the radius
    val wire = Graph.bfs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(wire.exists(_._3 == 1), "no seeds on the wire")
    assert(wire.exists(w => w._2 >= 1L), "no vector within the seed radius — degenerate")
    assert(wire.count(_._2 == -1L) < wire.length, "nothing reached at all")
  }

  test("neighbor jaccard: planted square + twin, naive replay, and a live wire") {
    import spark.implicits._
    // square 1-2-3-4 (cycle): opposite corners share BOTH neighbors
    // (jaccard 2/(2+2-2) = 1.0, no direct edge — the missing-link
    // class); adjacent corners share none. Twin pair 10/11 both tied to
    // 12 and 13 AND to each other: N(10)={11,12,13}, N(11)={10,12,13},
    // shared {12,13} → 2/(3+3-2) = 0.5 with is_edge = 1.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.jaccardOf(edges, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getInt(6))))
      .toMap
    assert(got((1L, 3L)) == ((2L, 2L, 2L, 1.0, 0)), s"square diagonal: ${got.get((1L, 3L))}")
    assert(got((2L, 4L)) == ((2L, 2L, 2L, 1.0, 0)))
    assert(got((10L, 11L)) == ((2L, 3L, 3L, 0.5, 1)), s"twin edge: ${got.get((10L, 11L))}")
    assert(got((12L, 13L)) == ((2L, 2L, 2L, 1.0, 0)), "co-parents of the twins")
    assert(!got.contains((1L, 2L)), "adjacent square corners share nothing")
    // live wire: replay the whole report naively from the collected edges
    val wire = Graph.jaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getInt(6))).toSeq
    assert(wire.nonEmpty, "no similar pairs on the wire — degenerate")
    val knn = graft.operators.Similarity.knnGraph(spark, sfDir, 3)
      .select("vec_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (knn ++ knn.map(_.swap)).distinct
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      (u, nu) <- nbrs.toSeq; v <- nbrs.keys if u < v
      shared = (nu & nbrs(v)).size if shared > 0
      j = BigDecimal(shared.toDouble / (nu.size + nbrs(v).size - shared))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble if j >= 0.4
    } yield (u, v, shared.toLong, nu.size.toLong, nbrs(v).size.toLong, j,
      if (nu.contains(v)) 1 else 0)).sortBy(t => (t._1, t._2))
    assert(wire == brute, "wire report must replay naively")
  }

  test("adamic-adar: hub evidence discounts, 4-cycle closed form, brute replay") {
    import spark.implicits._
    // 4-cycle 1-10-2-20-1: nodes 1 and 2 share the two degree-2
    // neighbors 10 and 20 → AA = 2·floor(1e6/ln 2); the pair is NOT an
    // edge, so it's a prediction. Star h=99 over leaves 30..35: any two
    // leaves share only the degree-6 hub → AA = floor(1e6/ln 6), weak.
    val und = Seq((1L, 10L), (10L, 2L), (2L, 20L), (20L, 1L)) ++
      (30L to 35L).map(l => (99L, l))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.adamicAdarOf(edges, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val w2 = math.floor(1000000.0 / math.log(2.0)).toLong
    val w6 = math.floor(1000000.0 / math.log(6.0)).toLong
    assert(got((1L, 2L)) == ((2L, 2L * w2, 0)), s"cycle pair: ${got((1L, 2L))}")
    assert(got((30L, 31L)) == ((1L, w6, 0)), s"hub pair: ${got((30L, 31L))}")
    assert(2L * w2 > 1500000L && w6 < 1500000L,
      "the default bar keeps the strong pair and drops the hub-only pair")
    // live wire: replay the whole thresholded report from collected edges
    val wire = Graph.adamicAdar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    val knn = graft.operators.Similarity.knnGraph(spark, sfDir, 3)
      .select("vec_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (knn ++ knn.map(_.swap)).distinct
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      (u, nu) <- nbrs.toSeq; v <- nbrs.keys if u < v
      shared = (nu & nbrs(v)) if shared.nonEmpty
      aa = shared.toSeq.map(w =>
        math.floor(1000000.0 / math.log(nbrs(w).size.toDouble)).toLong).sum
      if aa >= 1500000L
    } yield (u, v, shared.size.toLong, aa,
      if (nu.contains(v)) 1 else 0)).sortBy(t => (t._1, t._2))
    assert(wire.nonEmpty && wire == brute, "wire report must replay naively")
  }
}
