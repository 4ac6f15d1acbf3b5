package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: maximum brace-nesting depth of a JSON-ish
  * payload (http_utils.py:95 `_json_depth` / MAX_JSON_DEPTH — the
  * reference refuses pathologically nested responses BEFORE parsing them;
  * a recursive parse of attacker-controlled nesting is exactly what the
  * guard exists to avoid, so this is a flat single-pass scan).
  *
  * Braces inside double-quoted strings are ignored; quotes toggle on every
  * `"` (no escape-sequence handling — the DuckDB oracle mirrors this exact
  * rule with a character-window sum, so both engines agree on all inputs).
  */
case class JsonDepth(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "json_depth"

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(JsonDepth.depth(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonDepth.depth($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonDepth =
    copy(child = newChild)
}

object JsonDepth {
  /** Single-pass scan shared by interpreted and generated code paths. */
  def depth(s: UTF8String): Int = {
    val str = s.toString
    var d = 0; var maxD = 0; var inStr = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '"') inStr = !inStr
      else if (!inStr) {
        if (c == '{') { d += 1; if (d > maxD) maxD = d }
        else if (c == '}') d -= 1
      }
      i += 1
    }
    maxD
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_depth", exprs => JsonDepth(exprs.head), "built-in")

  def jsonDepth(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    call_function("json_depth", c)
  }
}
