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
}
