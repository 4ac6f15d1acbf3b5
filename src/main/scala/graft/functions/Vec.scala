package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math on `array<float>` embedding columns. The dot product — the
  * one expression evaluated per candidate PAIR in the similarity joins — is
  * the native codegen'd [[DotProduct]] (HOF lambdas are interpreted and
  * re-inlined per reference, measured ~10× slower in the r1 bench); it
  * accumulates left-to-right, so the oracle's `list_inner_product` sees
  * identical arithmetic.
  */
object Vec {

  /** Cast an array<float> to array<double> (all math in f64 for parity). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential left-to-right dot product (native codegen'd expression). */
  def dot(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    DotProduct.register(spark)
    call_function("vec_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic LSH hyperplane family: weight(plane, dim) derived from a
    * Knuth-style multiplicative hash — reproducible on any engine, no RNG. */
  def planeWeights(nPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dims) { (h, d) =>
      (((h.toLong * dims + d) * 2654435761L) % 2001L - 1000L) / 1000.0
    }

  /** Sign-bucket id from hyperplane dots: bit h set iff dot(v, plane_h)>0. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, h) =>
      val wl = array(w.toIndexedSeq.map(lit): _*)
      when(dot(vec, wl) > 0.0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
}
