package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math on `array<float>` embedding columns, built from codegen'd
  * built-ins (`transform`/`zip_with`/`aggregate`) — no UDFs, so the hot
  * path stays inside whole-stage codegen and the oracle (which accumulates
  * left-to-right, like these folds) sees identical arithmetic.
  */
object Vec {

  /** Cast an array<float> to array<double> (all math in f64 for parity). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential left-to-right dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

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
      val wl = array(w.map(lit): _*)
      when(dot(vec, wl) > 0.0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
}
