package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer/Wilkerson/Aiken, the MOSS scheme) — rolling FNV-1a hashes of
  * character k-grams (k=5), then the minimum of each sliding window
  * (w=8) of consecutive hashes, deduplicated and sorted.
  *
  * Guarantees: any shared substring of length ≥ w+k−1 between two
  * documents yields at least one shared fingerprint, so fingerprint
  * overlap is a sound near-dup candidate signal. Per-row, no shuffle; the
  * candidate join on exploded fingerprints is a plain equi-join.
  */
case class WinnowFingerprints(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.fingerprints($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val K = 5 // k-gram length (chars)
  private val W = 8 // winnowing window (hashes)

  /** Shared by interpreted and generated code paths. */
  def fingerprints(input: UTF8String): GenericArrayData = {
    val b = input.toLowerCase.getBytes
    var nChars = 0
    var off = 0
    val starts = new Array[Int](b.length + 1)
    while (off < b.length) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(b(off))
      nChars += 1
    }
    starts(nChars) = b.length
    if (nChars < K) return new GenericArrayData(Array.emptyLongArray)
    val n = nChars - K + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var p = starts(i)
      val end = starts(i + K)
      while (p < end) {
        h ^= (b(p) & 0xffL)
        h *= 0x100000001b3L
        p += 1
      }
      hs(i) = h
      i += 1
    }
    if (n <= W) {
      var m = hs(0); i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    // sliding-window minima (O(n·W); W is a small constant)
    val mins = new Array[Long](n - W + 1)
    i = 0
    while (i <= n - W) {
      var m = hs(i)
      var j = i + 1
      while (j < i + W) { if (hs(j) < m) m = hs(j); j += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var w = 0
    i = 0
    while (i < mins.length) {
      if (w == 0 || mins(i) != mins(w - 1)) { mins(w) = mins(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, w))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", exprs => WinnowFingerprints(exprs.head), "built-in")

  def winnowFingerprints(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    call_function("winnow_fingerprints", c)
  }
}
