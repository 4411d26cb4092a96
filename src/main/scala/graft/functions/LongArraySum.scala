package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: left-fold sum of an array<long> column.
  *
  * Value-identical to the builtin `aggregate(a, 0L, (acc, x) -> acc + x)`
  * for null-free arrays (the fingerprint/code-array contract) — but any
  * lambda is CodegenFallback, and one `aggregate` in a projection drags
  * the WHOLE corpus-sized projection interpreted (the round-8 codegen
  * audit's x4 finding; same mechanism ws_tokens closed for the
  * tokenize stage in round 7). A two-value integer fold deserves a
  * 4-line loop with `doGenCode`, not an interpreter.
  *
  * Overflow semantics: this fold WRAPS (Java `+`), where the builtin
  * under ANSI mode throws. The fingerprint sums it serves stay far
  * from the edge (≤~60 values < 2^60); a caller needing checked
  * arithmetic should keep the builtin.
  */
case class LongArraySum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_array_sum needs array<bigint>, got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "long_array_sum"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongArraySum {
  def apply(a: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(LongArraySum(
      org.apache.spark.sql.GraftColumnBridge.expression(a)))
}
