package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence oracle for the r18 native PQ encoder: [[PqCodesExpr]]
  * must pick BYTE-IDENTICAL sub-codes to the retained
  * [[Similarity.pqCodeCols]] Column formulation (the spec/curve form) on
  * the real embeddings and on adversarial vectors (exact codeword hits —
  * tie-on-zero distances — and scaled/negated variants), for every nSub
  * the sweep uses. The kernel is a pure per-task/codegen-size
  * optimization of the index build; any divergence here would change the
  * persisted layout and is a correctness bug, not a perf trade. */
class PqKernelsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("PqCodesExpr == pqCodeCols for nSub 4/8/16, corpus + adversarial") {
    val full = Similarity.vectors(spark, sfDir)
    val cb = Similarity.trainQuantizer(full)
    val e = full.select(col("vec_id"), col("v"))
    val dim = cb.head._2.length
    // adversarial rows: exact codewords (every subspace distance ties at
    // its own minimum), zero vector, sign-flipped and scaled codewords
    val planted = cb.take(3).zipWithIndex.flatMap { case ((_, cv), i) =>
      Seq((900000L + i, cv), (910000L + i, cv.map(-_)),
        (920000L + i, cv.map(_ * 1e6)))
    } :+ (930000L, Seq.fill(dim)(0.0))
    val rows = e.as[(Long, Seq[Double])].collect().toSeq ++ planted
    val frame = rows.toDF("vec_id", "v")
    Seq(4, 8, 16).foreach { nSub =>
      val oracle = frame.select(col("vec_id") +:
        Similarity.pqCodeCols(cb, nSub): _*)
      val kernel = frame
        .withColumn("pq", graft.functions.PqKernels.pqCodesCol(col("v"), cb, nSub))
        .select(col("vec_id") +:
          (0 until nSub).map(m => col("pq")(m).cast("int").as(s"code_$m")): _*)
      val diff = kernel.exceptAll(oracle).count() + oracle.exceptAll(kernel).count()
      assert(diff == 0, s"nSub=$nSub")
    }
  }
}
