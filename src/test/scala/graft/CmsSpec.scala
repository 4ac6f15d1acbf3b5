package graft

import graft.functions.CmsAggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the count–min sketch TypedImperativeAggregate (SURVEY E19):
  * partial-merge algebra, partitioning invariance, the ≥-exact guarantee. */
class CmsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshAgg = CmsAggregate(org.apache.spark.sql.catalyst.expressions.Literal(0L))

  test("merge is associative and commutative on raw buffers") {
    val agg = freshAgg
    def buf(seed: Int): Array[Long] =
      Array.tabulate(CmsAggregate.Depth * CmsAggregate.Width)(i => ((i * seed) % 7).toLong)
    val (a, b, c) = (buf(3), buf(5), buf(11))
    val left = agg.merge(agg.merge(buf(3), buf(5)), buf(11))
    val right = agg.merge(buf(3), agg.merge(buf(5), buf(11)))
    val comm = agg.merge(agg.merge(buf(5), buf(3)), buf(11))
    assert(left.toSeq == right.toSeq && left.toSeq == comm.toSeq)
    assert(a.toSeq != left.toSeq) // merging actually accumulated
    assert(b.nonEmpty && c.nonEmpty)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = freshAgg
    val buf = Array.tabulate(CmsAggregate.Depth * CmsAggregate.Width)(_.toLong * 13L)
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("sketch is invariant to partitioning (partial + merge correctness)") {
    val keys = (0L until 2000L).map(k => k % 37)
    def sketchOf(parts: Int): Seq[Long] = keys.toDF("k").repartition(parts)
      .agg(CmsAggregate.cmsSketch(spark, col("k")).as("s"))
      .head().getSeq[Long](0)
    assert(sketchOf(1) == sketchOf(8))
  }

  test("hll: merge is associative, commutative, idempotent on registers") {
    import graft.functions.HllAggregate
    val agg = HllAggregate(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    def regs(seed: Int): Array[Byte] =
      Array.tabulate(HllAggregate.M)(i => ((i * seed) % 20).toByte)
    val left = agg.merge(agg.merge(regs(3), regs(7)), regs(13))
    val right = agg.merge(regs(3), agg.merge(regs(7), regs(13)))
    val comm = agg.merge(agg.merge(regs(7), regs(3)), regs(13))
    val idem = agg.merge(left.clone(), left.clone())
    assert(left.toSeq == right.toSeq && left.toSeq == comm.toSeq)
    assert(idem.toSeq == left.toSeq, "max-merge must be idempotent")
  }

  test("hll: estimate is partitioning-invariant and within the error bound") {
    import graft.functions.HllAggregate
    for (trueN <- Seq(50L, 1000L, 20000L)) {
      val df = (0L until trueN * 3).map(_ % trueN).toDF("k")
      def est(parts: Int): Long = df.repartition(parts)
        .agg(HllAggregate.hllSketch(spark, col("k")).as("e")).head().getLong(0)
      val (e1, e8) = (est(1), est(8))
      assert(e1 == e8, s"partitioning changed the estimate: $e1 vs $e8")
      // 256 registers → ~6.5% std error; allow 4 sigma
      assert(math.abs(e1 - trueN).toDouble / trueN < 0.26,
        s"estimate $e1 too far from $trueN")
    }
  }

  test("estimates dominate exact counts and are tight on sparse keys") {
    val keys = (0L until 5000L).map(k => k % 61)
    val df = keys.toDF("k")
    val sk = df.agg(CmsAggregate.cmsSketch(spark, col("k")).as("s"))
    val probes = (0L until 61L)
    val ests = sk.select(probes.map(k =>
        CmsAggregate.estimate(col("s"), k).as(s"e$k")): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probes.zip(ests).foreach { case (k, est) =>
      assert(est >= exact(k), s"CMS must never under-count: key=$k")
      // 61 keys in 4x256 counters: collisions possible but bounded
      assert(est <= exact(k) + keys.size / CmsAggregate.Width,
        s"estimate too loose: key=$k est=$est exact=${exact(k)}")
    }
  }

  test("quantile: merge algebra, round-trip, partitioning invariance, bin-width error bound") {
    import graft.functions.QuantileAggregate
    val agg = QuantileAggregate(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), 0.0, 1.0)
    def buf(seed: Int): Array[Long] =
      Array.tabulate(QuantileAggregate.NBins)(i => ((i * seed) % 9).toLong)
    val left = agg.merge(agg.merge(buf(3), buf(5)), buf(11))
    val right = agg.merge(buf(3), agg.merge(buf(5), buf(11)))
    val comm = agg.merge(agg.merge(buf(5), buf(3)), buf(11))
    assert(left.toSeq == right.toSeq && left.toSeq == comm.toSeq)
    assert(agg.deserialize(agg.serialize(left)).toSeq == left.toSeq)

    // sketch of 0..9999 over [0, 10000): bin counts invariant to layout
    val vs = (0 until 10000).map(_.toDouble)
    def sketchOf(parts: Int): Seq[Long] = vs.toDF("v").repartition(parts)
      .agg(QuantileAggregate.quantileSketch(spark, col("v"), 0.0, 10000.0).as("s"))
      .head().getSeq[Long](0)
    val s1 = sketchOf(1)
    assert(s1 == sketchOf(8), "partitioning changed the sketch")
    assert(s1.sum == vs.size, "every value lands in exactly one bin")
    // uniform data: the q-quantile bin edge is within one bin width of truth
    val w = 10000.0 / QuantileAggregate.NBins
    for (q <- Seq(0.25, 0.5, 0.75, 0.95)) {
      val rank = math.ceil(q * vs.size).toLong
      val qbin = s1.scanLeft(0L)(_ + _).tail.indexWhere(_ >= rank)
      val est = qbin * w
      val truth = vs.sorted.apply((rank - 1).toInt)
      assert(math.abs(est - truth) <= w,
        s"q=$q est=$est truth=$truth exceeds one bin width $w")
    }
  }

  test("quantile: decimal input sketches like double, degenerate domain fails loudly") {
    import graft.functions.QuantileAggregate
    // DECIMAL column (Spark's Decimal runtime value is not a j.l.Number —
    // the register path casts the child to double first)
    val dec = (1 to 100).map(i => BigDecimal(i) / 4).toDF("v")
      .select(col("v").cast("decimal(10,2)").as("v"))
    val sDec = dec.agg(QuantileAggregate.quantileSketch(spark, col("v"), 0.0, 25.0).as("s"))
      .head().getSeq[Long](0)
    val sDbl = dec.select(col("v").cast("double").as("v"))
      .agg(QuantileAggregate.quantileSketch(spark, col("v"), 0.0, 25.0).as("s"))
      .head().getSeq[Long](0)
    assert(sDec == sDbl, "decimal input must bin like its double value")
    assert(sDec.sum == 100L)
    // lo >= hi would clamp everything into bin 0 via NaN math — must throw
    val ex = intercept[Exception] {
      dec.agg(QuantileAggregate.quantileSketch(spark, col("v"), 5.0, 5.0).as("s")).collect()
    }
    assert(ex.getMessage.contains("lo < hi"), ex.getMessage)
  }

  test("bloom: OR-merge algebra, no false negatives, real fact-side pruning") {
    import graft.functions.BloomAggregate
    val agg = BloomAggregate(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    def bits(seed: Int): Array[Long] =
      Array.tabulate(BloomAggregate.Words)(i => (i.toLong * seed) % 255)
    val assoc = agg.merge(agg.merge(bits(3), bits(7)), bits(13)).toSeq
    assert(assoc == agg.merge(bits(3), agg.merge(bits(7), bits(13))).toSeq)
    assert(assoc == agg.merge(agg.merge(bits(7), bits(3)), bits(13)).toSeq)
    val m = agg.merge(bits(3), bits(7))
    assert(agg.merge(m.clone(), m.clone()).toSeq == m.toSeq, "OR must be idempotent")

    // membership: every inserted key tests positive (no false negatives)
    val keys = (0L until 500L).map(_ * 37L)
    val sk = keys.toDF("k").agg(BloomAggregate.bloomAgg(spark, col("k")).as("bits"))
    val probe = keys.toDF("k").crossJoin(broadcast(sk))
      .filter(BloomAggregate.mightContain(col("bits"), col("k"))).count()
    assert(probe == keys.size, s"false negative: only $probe of ${keys.size} found")

    // pruning: the selective-dim bloom must actually shrink the fact side
    val survivors = graft.operators.Relational.bloomSurvivors(spark, sfDir)
    val total = Tables(spark, sfDir).orders.count()
    assert(survivors < total, s"bloom pruned nothing: $survivors of $total")
  }

  test("bloom: corpus-sized filter keeps FPR bounded where the fixed width saturates") {
    import graft.functions.BloomAggregate
    // sizeFor: floor below ~630 keys, ~13 bits/key above, word-aligned, capped
    assert(BloomAggregate.sizeFor(0L) == BloomAggregate.Bits)
    assert(BloomAggregate.sizeFor(100L) == BloomAggregate.Bits)
    assert(BloomAggregate.sizeFor(1000000L) == ((1000000L * 13 + 63) / 64 * 64))
    assert(BloomAggregate.sizeFor(Long.MaxValue / 16) == BloomAggregate.MaxBits)
    // past Long.MaxValue/13 keys the multiply would wrap negative — the
    // guard must clamp an astronomical estimate to the CAP, not let it
    // fall through to the 8 KiB floor
    assert(BloomAggregate.sizeFor(Long.MaxValue) == BloomAggregate.MaxBits)
    assert(BloomAggregate.sizeFor(Long.MaxValue / 13 + 1) == BloomAggregate.MaxBits)
    assert(BloomAggregate.sizeFor(50000L) % 64 == 0)

    // 50k planted keys saturate the 8192-bit floor (FPR ≈ 1.0 there); the
    // sized filter (650k bits) must keep measured FPR under 5% — and the
    // ≥5% head-room of the ~0.6% design point makes this non-flaky.
    val n = 50000L
    val ins = spark.range(n).selectExpr("id * 2 as k") // evens inserted
    val sized = ins.agg(BloomAggregate.bloomAgg(spark, col("k"), n).as("bits"))
    val probes = spark.range(n).selectExpr("id * 2 + 1 as k") // odds never inserted
    val fpSized = probes.crossJoin(broadcast(sized))
      .filter(BloomAggregate.mightContain(col("bits"), col("k"))).count()
    assert(fpSized.toDouble / n < 0.05, s"sized-bloom FPR ${fpSized.toDouble / n} >= 5%")
    val fixed = ins.agg(BloomAggregate.bloomAgg(spark, col("k")).as("bits"))
    val fpFixed = probes.crossJoin(broadcast(fixed))
      .filter(BloomAggregate.mightContain(col("bits"), col("k"))).count()
    assert(fpFixed.toDouble / n > 0.5,
      s"expected the fixed width to saturate at ${n} keys, FPR ${fpFixed.toDouble / n}")
    // no false negatives at any size
    val hits = ins.crossJoin(broadcast(sized))
      .filter(BloomAggregate.mightContain(col("bits"), col("k"))).count()
    assert(hits == n, s"false negative in sized bloom: $hits of $n")
  }
}
