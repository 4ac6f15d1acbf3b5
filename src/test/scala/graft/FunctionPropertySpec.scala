package graft

import graft.functions.{JaccardSorted, ShingleHashes}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties for the native Catalyst expressions — these are
  * hand-rolled eval loops, so pin them against straightforward Scala
  * reference implementations on random (seeded, reproducible) inputs.
  * All cases are evaluated in ONE DataFrame per property. */
class FunctionPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val longSet: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(-50L, 50L))

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaChar, 2 -> Gen.const(' '))).map(_.mkString))

  test("jaccard_sorted equals set-based jaccard on 200 random long-set pairs") {
    val cases = samples(Gen.zip(longSet, longSet), 200).map { case (a, b) =>
      (a.distinct.sorted, b.distinct.sorted)
    }
    val expected = cases.map { case (sa, sb) =>
      val inter = sa.toSet.intersect(sb.toSet).size
      val union = sa.toSet.union(sb.toSet).size
      if (union == 0) 0.0 else inter.toDouble / union
    }
    val got = cases.toDF("a", "b")
      .select(JaccardSorted.jaccardSorted(spark, col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == expected)
  }

  test("shingle_hashes: one hash per distinct 3-gram; sorted distinct output") {
    val texts = samples(asciiText, 200)
    val rows = texts.map(Tuple1(_)).toDF("t")
      .select(ShingleHashes.shingleHashes(spark, col("t")))
      .collect().map(_.getSeq[Long](0)).toSeq
    texts.zip(rows).foreach { case (s, arr) =>
      val expected = s.toLowerCase.sliding(3).filter(_.length == 3).toSet.size
      assert(arr.size == expected, s"text=${s.toLowerCase}") // modulo 64-bit collisions
      assert(arr == arr.distinct.sorted)
    }
  }

  test("vec_dot equals a left-fold dot product on 200 random vector pairs (both element types)") {
    import graft.functions.Vec
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 250.0))
    val cases = samples(Gen.zip(vecGen, vecGen), 200)
    val expected = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }
    // double arrays
    val gotD = cases.toDF("a", "b")
      .select(Vec.dot(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(gotD == expected)
    // float arrays widen per element — must equal the pre-cast fold
    val fCases = cases.map { case (a, b) => (a.map(_.toFloat), b.map(_.toFloat)) }
    val expectedF = fCases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    val gotF = fCases.toDF("a", "b")
      .select(Vec.dot(col("a"), col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(gotF == expectedF)
  }

  test("json_depth: quote-aware max nesting on constructed and random payloads") {
    import graft.functions.JsonDepth
    val fixed = Seq(
      ("{}", 1), ("""{"k": 1}""", 1), ("""{"a": {"b": {"c": 1}}}""", 3),
      ("""{"s": "ignore {{{ these"}""", 1), ("", 0), ("no braces", 0),
      ("""[{"a": {}}, {"b": {"c": {}}}]""", 3), ("}{", 0)) // unbalanced: never exceeds 0
    val jsonish: Gen[String] = Gen.listOf(Gen.oneOf('{', '}', '"', 'a', ' '))
      .map(_.mkString)
    val rnd = samples(jsonish, 200)
    def ref(t: String): Int = {
      var d = 0; var m = 0; var in = false
      t.foreach {
        case '"' => in = !in
        case '{' if !in => d += 1; m = math.max(m, d)
        case '}' if !in => d -= 1
        case _ => ()
      }
      m
    }
    val all = fixed.map(_._1) ++ rnd
    val got = all.map(Tuple1(_)).toDF("t")
      .select(JsonDepth.jsonDepth(spark, col("t"))).collect().map(_.getInt(0)).toSeq
    assert(got == all.map(ref))
    fixed.zip(got).foreach { case ((t, e), g) => assert(g == e, s"payload=$t") }
  }

  test("vec_dot yields NULL on mismatched dimensionality (corrupt-data signal)") {
    import graft.functions.Vec
    val rows = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), (Seq(1.0), Seq(1.0)))
      .toDF("a", "b").select(Vec.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0), "short vector must not produce a partial dot")
    assert(rows(1).getDouble(0) == 1.0)
  }

  test("substring spans equal the brute-force witness-merge on a random corpus") {
    import graft.operators.Dedup
    val k = 3
    // small vocabulary forces organic cross-doc and within-doc collisions
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(doc, 80).zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
    // reference: count k-gram occurrences corpus-wide, keep positions of
    // grams seen >= 2 times, merge per doc while next <= prev + k
    val grams = docs.flatMap { case (id, ws) =>
      if (ws.length < k) Nil
      else ws.sliding(k).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }.toSeq
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1).view.mapValues { hits =>
        val ps = hits.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var start = ps.head; var prev = ps.head; var n = 1L
        ps.tail.foreach { p =>
          if (p > prev + k) { spans += ((start.toLong, prev.toLong + k - 1, n)); start = p; n = 0 }
          prev = p; n += 1
        }
        spans += ((start.toLong, prev.toLong + k - 1, n))
        spans.toSeq
      }.toMap
    val expectedRows = expected.toSeq.flatMap { case (id, spans) =>
      spans.map { case (s, e, n) => (id, s, e, e - s + 1, n) }
    }.sortBy(r => (r._1, r._2))
    val got = Dedup.substringSpans(
        docs.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expectedRows, s"got ${got.take(5)}... expected ${expectedRows.take(5)}...")
    assert(expectedRows.nonEmpty, "degenerate test: no duplicated grams generated")
  }

  test("pq encode equals brute-force squared-distance argmin on 200 random vectors") {
    import graft.operators.Similarity
    // the column form ranks codewords by ‖c‖² − 2⟨v,c⟩; the reference
    // form is plain Σ(x−c)². Same winner on every random vector and a
    // random codebook (fp noise between the two forms is ~1e-16, far
    // below random codeword separation).
    val dim = 16; val nSub = 4; val sd = dim / nSub
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 500.0))
    val cb: Seq[(Int, Seq[Double])] =
      samples(vecGen, 6).zipWithIndex.map { case (v, i) => (i, v) }
    val vecs = samples(vecGen, 200).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val expected = vecs.map { case (_, v) =>
      (0 until nSub).map { m =>
        cb.sortBy(_._1).zipWithIndex.minBy { case ((_, cv), li) =>
          val d2 = (m * sd until (m + 1) * sd)
            .map(j => (v(j) - cv(j)) * (v(j) - cv(j))).sum
          (d2, li)
        }._2
      }
    }
    val got = Similarity.pqEncode(
        vecs.toDF("vec_id", "v")
          .select(col("vec_id"), col("v").cast("array<double>").as("v")),
        cb, nSub)
      .orderBy(col("vec_id")).collect()
      .map(r => (1 to nSub).map(r.getInt))
    assert(got.toSeq == expected)
  }

  test("z_interleave equals the per-bit formula on 400 random grid points and the corners") {
    val g16 = Gen.chooseNum(0L, 65535L)
    val cases = samples(Gen.zip(g16, g16), 400) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
    def perBit(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val expected = cases.map { case (x, y) => perBit(x, y) }
    val got = cases.toDF("x", "y")
      .select(graft.functions.ZInterleave.zInterleave(spark, col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // monotone blocks: clearing low bits of both inputs lower-bounds the code
    cases.foreach { case (x, y) =>
      val block = graft.functions.ZInterleave.morton(x & ~0xffL, y & ~0xffL)
      assert(graft.functions.ZInterleave.morton(x, y) >= block)
    }
  }
}
