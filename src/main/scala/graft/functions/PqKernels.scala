package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native PQ sub-code encoder (r18, VERDICT r17 item 7): one expression
  * computing ALL `nSub` sub-codes of a vector, replacing the per-subspace
  * `array_position(dists, array_min(dists))` Column trees that
  * [[graft.operators.Similarity.pqCodeCols]] builds (|codebook| vec_dot
  * calls + one `slice` array allocation per subspace per row, and a large
  * generated-code footprint that dominated the cold index build's JIT —
  * measured ~1.3 s of the 9.6 s cold build on the r18 box by a
  * drop-the-codes probe).
  *
  * Byte-exactness contract (spec-pinned in PqKernelsSpec against the
  * retained pqCodeCols oracle for nSub ∈ {4, 8, 16}):
  *   - per codeword: dist = ‖c‖² − 2⟨v_m, c⟩ with ‖c‖² folded at PLAN
  *     time by the same sequential `foldLeft(0.0)(acc + x*x)` and the
  *     dot the same left-to-right loop [[DotProduct.dot]] runs — the
  *     doubles are bit-identical by construction;
  *   - argmin: first index of the minimum under `java.lang.Double.compare`
  *     — exactly `array_position(dists, array_min(dists))`'s strict-lt
  *     fold + first-equiv scan under Spark's double ordering.
  */
object PqKernels {

  /** codes(v) over a flat row-major codebook (nCb × dim) with per-
    * (subspace, codeword) precomputed squared norms (nSub × nCb,
    * index m·nCb+c). Returns nSub ints. */
  def codes(v: ArrayData, flat: Array[Double], bbs: Array[Double],
      nCb: Int, nSub: Int): GenericArrayData = {
    val dim = v.numElements()
    val sd = dim / nSub
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = 0.0
      var bestI = -1
      var c = 0
      while (c < nCb) {
        var s = 0.0
        var i = 0
        val vOff = m * sd
        val cOff = c * dim + m * sd
        while (i < sd) {
          s += v.getDouble(vOff + i) * flat(cOff + i)
          i += 1
        }
        val d = bbs(m * nCb + c) - 2.0 * s
        if (bestI < 0 || java.lang.Double.compare(d, best) < 0) {
          best = d
          bestI = c
        }
        c += 1
      }
      out(m) = bestI
      m += 1
    }
    new GenericArrayData(out)
  }

  def pqCodesCol(v: Column, cb: Seq[(Int, Seq[Double])], nSub: Int): Column = {
    val dim = cb.head._2.length
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    val sd = dim / nSub
    val sorted = cb.sortBy(_._1)
    val flat = sorted.iterator.flatMap(_._2).toArray
    // ‖c_{l,m}‖² exactly as pqCodeCols folds it (sequential, plan time)
    val bbs = new Array[Double](nSub * sorted.size)
    sorted.zipWithIndex.foreach { case ((_, cv), c) =>
      (0 until nSub).foreach { m =>
        bbs(m * sorted.size + c) =
          cv.slice(m * sd, (m + 1) * sd).foldLeft(0.0)((acc, x) => acc + x * x)
      }
    }
    GraftShims.exprColumn(PqCodesExpr(GraftShims.colExpr(v), flat, bbs,
      sorted.size, nSub))
  }
}

case class PqCodesExpr(child: Expression, flat: Array[Double],
    bbs: Array[Double], nCb: Int, nSub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  override def nullSafeEval(input: Any): Any =
    PqKernels.codes(input.asInstanceOf[ArrayData], flat, bbs, nCb, nSub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val bbsRef = ctx.addReferenceObj("pqBbs", bbs, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.codes($c, $flatRef, $bbsRef, $nCb, $nSub)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}
