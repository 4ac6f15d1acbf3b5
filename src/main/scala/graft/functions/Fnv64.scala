package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FNV-1a 64-bit hash of a string.
  *
  * The engine's shared token/shingle hash (the SimHash64/ShingleHashes
  * primitive) exposed as a scalar: chosen BECAUSE it is engine-independent
  * — the DuckDB oracles replay it byte-for-byte with a HUGEINT fold
  * (SparkEntry's fnvFold), so any operator keyed on it (the F92 watermark
  * green-list) hash-matches across engines.
  *
  * A Catalyst `Expression` (not a UDF) so it evaluates on `UTF8String`
  * bytes without row-to-JVM-object conversion and stays inside
  * whole-stage codegen.
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Fnv64.fnv1a(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.fnv1a($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {

  /** Shared by interpreted and generated code paths (and by specs that
    * replay the hash independently). */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Register `fnv64` in the session's function registry (the Spark 4
    * path for exposing a raw Catalyst expression as a SQL/Column fn). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64", exprs => Fnv64(exprs.head), "built-in")

  def fnv64(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("fnv64", c)
  }
}
