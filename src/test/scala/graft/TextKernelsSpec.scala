package graft

import graft.functions.TextKernels
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence oracle for the r17 native token/gram kernels: each kernel
  * must be BYTE-IDENTICAL to the higher-order-function formulation it
  * replaced, on the real corpus and on adversarial strings (unicode
  * whitespace look-alikes, multi-byte code points, case-mapping edge
  * cases, empties). The kernels are a pure per-task optimization —
  * any divergence here is a correctness bug, not a perf trade. */
class TextKernelsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Real corpus + planted adversarial rows. NBSP ( ) and ideographic
    * space (　) are NOT Java-regex \s, so they must stay inside
    * tokens; vertical tab () and form feed () ARE \s. */
  private lazy val corpus = {
    val adversarial = Seq(
      "",
      " ",
      "\t\n\r",
      "one",
      " leading and trailing  ",
      "tab\tnewline\ncarriage\rmix \t\n end",
      "nbsp stays ideographic　stays",
      "UPPER Mixed ÉTÉ İstanbul ΣΊΣΥΦΟΣ ΤΈΛΟΣ",
      "emoji 🎉🎊 multi🧵byte ñandú",
      "ß sharp ﬁ ligature Ⅻ numeral",
      "a b c d e f g h i j k l m n o p",
      "dup dup dup dup dup",
      "x".repeat(3) + " " + "y".repeat(5000) + " tail")
      .zipWithIndex.map { case (t, i) => (10000L + i, t) }
    Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq ++
      adversarial
  }.toDF("doc_id", "text")

  test("tokens kernel == filter(split(lower)) HOF, corpus + adversarial") {
    val diff = corpus
      .select(TextAnalysis.tokens(col("text")).as("k"),
        TextAnalysis.tokensHof(col("text")).as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(diff.count() == 0)
  }

  test("wordGrams kernel == transform/slice/array_join HOF for n=1,2,3,8") {
    Seq(1, 2, 3, 8).foreach { n =>
      val diff = corpus
        .select(TextAnalysis.wordGrams(TextAnalysis.tokens(col("text")), n).as("k"),
          TextAnalysis.wordGramsHof(TextAnalysis.tokensHof(col("text")), n).as("h"))
        .filter(not(col("k") <=> col("h")))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("wordGrams kernel keeps array_join's skip-null rule on null elements") {
    val arrs = Seq(
      (1L, Seq[String]("a", null, "b", "c")),
      (2L, Seq[String](null, null)),
      (3L, Seq[String]("x", null))).toDF("id", "toks")
    Seq(1, 2, 3).foreach { n =>
      val diff = arrs
        .select(TextAnalysis.wordGrams(col("toks"), n).as("k"),
          TextAnalysis.wordGramsHof(col("toks"), n).as("h"))
        .filter(not(col("k") <=> col("h")))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("gramHashes kernel == sorted distinct xxhash64 of the gram strings") {
    Seq(2, 8).foreach { k =>
      val diff = corpus
        .select(TextKernels.gramHashesCol(col("text"), k).as("kh"),
          array_sort(array_distinct(transform(
            TextAnalysis.wordGramsHof(TextAnalysis.tokensHof(col("text")), k),
            g => xxhash64(g)))).as("hh"))
        .filter(not(col("kh") <=> col("hh")))
      assert(diff.count() == 0, s"k=$k")
    }
  }

  test("greenPairs kernel == fnv64 bit-40 filter over bigram strings") {
    graft.functions.Fnv64.register(spark)
    val hof = corpus
      .withColumn("grams",
        TextAnalysis.wordGramsHof(TextAnalysis.tokensHof(col("text")), 2))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_pairs"),
        expr("cast(size(filter(grams, g -> ((fnv64(g) >> 40) & 1) = 0)) as long)")
          .as("n_green"))
    val kern = corpus
      .withColumn("wm", TextKernels.greenPairsCol(col("text")))
      .select(col("doc_id"), shiftright(col("wm"), 32).as("n_pairs"),
        (col("wm") bitwiseAND lit(0xffffffffL)).as("n_green"))
    assert(kern.exceptAll(hof).count() == 0 && hof.exceptAll(kern).count() == 0)
  }

  test("charBigramCounts kernel == explode(charBigrams) + groupBy count") {
    // the r18 fused form must emit exactly the (doc, bg, cnt) cells the
    // explode + groupBy pipeline produced (sorted output, exact counts),
    // on the corpus and every adversarial row
    val viaGroupBy = corpus
      .select(col("doc_id"), explode(TextKernels.charBigramsCol(col("text"))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val viaKernel = corpus
      .select(col("doc_id"),
        explode(TextKernels.charBigramCountsCol(col("text"))).as("s"))
      .select(col("doc_id"), col("s.bg").as("bg"), col("s.cnt").as("cnt"))
    assert(viaKernel.exceptAll(viaGroupBy).count() == 0 &&
      viaGroupBy.exceptAll(viaKernel).count() == 0)
    // sorted-distinct output order is part of the kernel contract
    val unsorted = corpus
      .select(TextKernels.charBigramCountsCol(col("text")).as("a"))
      .filter(not(col("a") <=> array_sort(col("a"))))
    assert(unsorted.count() == 0)
  }

  test("charBigrams kernel == transform(sequence, substr) over code points") {
    val lowered = lower(col("text"))
    val hof = when(length(lowered) >= 2,
      transform(sequence(lit(1), length(lowered) - 1), i => lowered.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val diff = corpus
      .select(TextKernels.charBigramsCol(col("text")).as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h")))
    assert(diff.count() == 0)
  }
}
