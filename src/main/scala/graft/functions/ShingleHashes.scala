package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sorted distinct 64-bit hashes of the
  * character 3-gram shingles of the lowercased input.
  *
  * Replaces the `transform(sequence…substr)→array_distinct→xxhash64→
  * array_sort` pipeline, which interprets four higher-order functions and
  * allocates a string per shingle. Here each 3-char window is hashed
  * (FNV-1a) directly over the UTF-8 bytes via a code-point boundary scan —
  * one long[] per document, no per-shingle allocation. Jaccard over these
  * hash sets equals Jaccard over the string sets up to 64-bit collisions
  * (~1e-15 per pair). Feeds [[JaccardSorted]].
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashShingles(input.asInstanceOf[UTF8String])

  // generated code calls the same static implementation -> the expression
  // stays inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.hashShingles($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Sorted distinct FNV-1a hashes of character 3-grams of the lowercased
    * input; shared by interpreted and generated code paths. */
  def hashShingles(input: UTF8String): GenericArrayData = {
    val b = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    // char start offsets (code points, matching substr semantics)
    var nChars = 0
    var off = 0
    val starts = new Array[Int](b.length + 1)
    while (off < b.length) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(b(off))
      nChars += 1
    }
    starts(nChars) = b.length
    if (nChars < 3) return new GenericArrayData(Array.emptyLongArray)
    val n = nChars - 2
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var p = starts(i)
      val end = starts(i + 3)
      while (p < end) {
        h ^= (b(p) & 0xffL)
        h *= 0x100000001b3L
        p += 1
      }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted array
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) hs else java.util.Arrays.copyOf(hs, w))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs.head), "built-in")

  def shingleHashes(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    call_function("shingle_hashes", c)
  }
}
