package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * Charikar's scheme: each token is hashed (FNV-1a, self-contained and
  * engine-independent); per bit, +1 if set else −1 over all tokens; the
  * sign of each accumulator gives the output bit. Near-identical documents
  * land at small Hamming distance, so a band of high bits is an LSH bucket
  * key for near-dup candidate generation at 100 TB (no pairwise pass).
  *
  * A Catalyst `Expression` (not a UDF) so it evaluates on `UTF8String`
  * without row-to-JVM-object conversion.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.simhashOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhashOf($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  @inline private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Shared by interpreted and generated code paths. */
  def simhashOf(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Register `simhash64` in the session's function registry (the Spark 4
    * path for exposing a raw Catalyst expression as a SQL/Column fn). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")

  def simhash64(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash64", c)
  }
}
