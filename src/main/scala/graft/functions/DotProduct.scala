package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: left-to-right dot product of two numeric
  * arrays (float or double elements; floats are widened per element, which
  * is exact, so the arithmetic is identical to casting the array first).
  *
  * This replaces the `aggregate(zip_with(...))` HOF fold in the similarity
  * hot paths: higher-order lambdas are interpreted (not codegen'd) and
  * re-inlined per reference by CollapseProject, which made the pairwise
  * cosine joins ~10× slower than this loop. Accumulation order is the same
  * sequential left fold the oracle's `list_inner_product` uses, so results
  * are bitwise identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    // mismatched dimensionality is corrupt data, not a partial dot — the
    // HOF fold this replaced yielded NULL there (zip_with null-pads), and
    // a silently-truncated cosine could pass a near-dup threshold
    if (a.numElements() != b.numElements()) null
    else java.lang.Double.valueOf(DotProduct.dot(a, b, isFloat(left), isFloat(right)))
  }

  // stays inside whole-stage codegen: the generated code calls the same
  // static loop the interpreter uses
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.DotProduct.dot($a, $b, ${isFloat(left)}, ${isFloat(right)}); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  /** Sequential left-to-right dot over equal-length arrays, shared by
    * interpreted and generated code paths (callers null out mismatched
    * lengths first). `af`/`bf` select float vs double element reads. */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
