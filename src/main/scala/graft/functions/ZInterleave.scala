package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 16-bit Morton interleave — bit i of `x`
  * lands at position 2i, bit i of `y` at 2i+1, yielding the 32-bit
  * z-order code D27's clustered layout ranges on. Codegen emits one call
  * into the shared magic-number spread (Morton's standard parallel-prefix
  * bit dilation — 4 shift/mask steps per operand instead of 16 per-bit
  * terms), so the whole code computes in ~10 register ops inside
  * whole-stage codegen with no boxing and no expression-tree blowup. */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_interleave expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "z_interleave"

  override def nullSafeEval(x: Any, y: Any): Any =
    java.lang.Long.valueOf(
      ZInterleave.morton(x.asInstanceOf[Long], y.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZInterleave.morton($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  /** Dilate the low 16 bits of v to even positions (parallel-prefix
    * spread: 0x0000ffff → 00ff00ff → 0f0f0f0f → 33333333 → 55555555). */
  private def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** The Morton code: x on even bit positions, y on odd. Shared by the
    * interpreted and generated code paths. */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave", exprs => ZInterleave(exprs.head, exprs(1)), "built-in")

  def zInterleave(spark: org.apache.spark.sql.SparkSession,
                  x: Column, y: Column): Column = {
    register(spark)
    call_function("z_interleave", x, y)
  }
}
