package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Planted-document specs for the text-analysis gates (SURVEY F31). */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("gopher rules: each rule rejects its planted violation and a clean doc passes all") {
    // a 60-word clean doc: alphabetic words, two required stop words,
    // normal word lengths, no symbols/bullets/ellipses
    val clean = ("the quick brown fox jumps with vigor " +
      (1 to 53).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      1L -> clean,
      // 2: too short (10 words)
      2L -> "the fox with nine more plain words here now",
      // 3: mean word length > 10 (every word 12+ chars, still stops present)
      3L -> ("the with " + (1 to 58).map(_ => "abcdefghijklmn").mkString(" ")),
      // 4: symbol ratio > 0.1 (60 words, 12 '#')
      4L -> (clean + " " + (1 to 12).map(_ => "#").mkString(" ")),
      // 5: >90% bullet lines (10 lines, all bulleted, words inside)
      5L -> (1 to 10).map(i => s"- the with line$i item$i").mkString("\n"),
      // 6: >30% ellipsis-ended lines
      6L -> Seq("the fox runs...", "with more...", "plain line", "end here...")
        .mkString("\n"),
      // 7: alpha-word fraction < 0.8 (60 words, 20 numeric)
      7L -> ("the with " + (1 to 38).map(i => s"w$i").mkString(" ") + " " +
        (1 to 20).map(i => s"$i$i").mkString(" ")),
      // 8: fewer than 2 required stop words
      8L -> (1 to 60).map(i => s"plain$i").mkString(" ")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherAudit(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getInt(8) == 1, s"clean doc rejected: ${out(1L)}")
    assert(out(1L).getLong(7) >= 2L)
    assert(out(2L).getInt(8) == 0 && out(2L).getLong(1) < 50L)
    assert(out(3L).getInt(8) == 0 && out(3L).getDouble(2) > 10.0)
    assert(out(4L).getInt(8) == 0 && out(4L).getDouble(3) > 0.1)
    assert(out(5L).getInt(8) == 0 && out(5L).getDouble(4) > 0.9)
    assert(out(6L).getInt(8) == 0 && out(6L).getDouble(5) > 0.3)
    assert(out(7L).getInt(8) == 0 && out(7L).getDouble(6) < 0.8)
    assert(out(8L).getInt(8) == 0 && out(8L).getLong(7) < 2L)
  }

  test("r7 factored cores survive empty inputs") {
    import org.apache.spark.sql.functions.col
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.gopherAudit(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.substringSpans(emptyDocs, 8).count() == 0)
    val emptyRuns = Seq.empty[(String, Long, Long, Double)]
      .toDF("source", "run_day", "n_features", "duration")
    assert(graft.operators.LoadOps.runDriftOverRuns(emptyRuns, 0.5).count() == 0)
    val emptyVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    assert(graft.operators.Similarity.measureRanges(emptyVecs).isEmpty)
    assert(graft.operators.Similarity
      .quantizeAudit(emptyVecs, Array.empty[(Double, Double)]).count() == 0)
  }

  test("curriculum buckets: standard ntile fill without a single-task window") {
    val df = TextAnalysis.sampleCurriculum(spark, sfDir)
    // the global rank comes from chunked prefix sums — the window must be
    // partitioned by chunk, never a SinglePartition global sort
    assert(!df.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "global ntile collapsed to a single-task window")
    val rows = df.collect()
    val total = rows.map(_.getLong(1)).sum
    val n = rows.length
    // SQL-standard fill: bucket sizes differ by at most 1, larger first
    val sizes = rows.sortBy(_.getInt(0)).map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"uneven ntile fill: ${sizes.toSeq}")
    assert(sizes.sorted.reverse.toSeq == sizes.toSeq, s"larger buckets must come first: ${sizes.toSeq}")
    assert(total == 500L && n == 10)
    // curriculum order: bucket 1 holds the best-scoring docs
    val byBucket = rows.sortBy(_.getInt(0))
    byBucket.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getDouble(3) >= lo.getDouble(2) - 1e-9,
        s"bucket ${hi.getInt(0)} min ${hi.getDouble(3)} < bucket ${lo.getInt(0)} max ${lo.getDouble(2)}")
    }
  }

  test("traindata pipeline: stage lineage chains, every stage only removes, pack count is the token ceiling") {
    val rows = TextAnalysis.traindataPipeline(spark, sfDir).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(rows.size == 5)
    val order = Seq("ingest", "gopher_filter", "dedup_fingerprint", "decontaminate")
    // units_in of each stage is the previous stage's units_out, and the
    // filter stages are monotone non-increasing in docs and tokens
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b).getLong(2) == rows(a).getLong(3),
        s"$b units_in != $a units_out")
      assert(rows(b).getLong(3) <= rows(b).getLong(2))
      assert(rows(b).getLong(4) <= rows(a).getLong(4), s"$b grew tokens")
      assert(rows(b).getLong(5) <= rows(a).getLong(5), s"$b grew id checksum")
    }
    assert(rows("ingest").getLong(2) == rows("ingest").getLong(3))
    // the pack stage reports ceil(tokens / 2048) output units over the
    // decontaminated survivors, straddling semantics
    val surv = rows("decontaminate")
    val pack = rows("pack_chunks")
    assert(pack.getLong(2) == surv.getLong(3))
    assert(pack.getLong(4) == surv.getLong(4) && pack.getLong(5) == surv.getLong(5))
    val toks = surv.getLong(4)
    val expectPacks = if (toks == 0) 0L else (toks - 1) / 2048 + 1
    assert(pack.getLong(3) == expectPacks, s"packs ${pack.getLong(3)} != $expectPacks")
    // the gate actually discriminates on this corpus (not all, not none)
    assert(rows("gopher_filter").getLong(3) > 0)
    assert(rows("gopher_filter").getLong(3) < rows("ingest").getLong(3))
  }
}
