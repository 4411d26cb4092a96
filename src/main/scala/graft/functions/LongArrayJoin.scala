package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: render an array<long> as a
  * separator-joined decimal string.
  *
  * Value-identical to the builtin
  * `array_join(transform(a, x -> CAST(x AS STRING)), sep)` for
  * null-free arrays (the minhash-signature contract; DuckDB's
  * `array_to_string` is the oracle twin) — but the transform LAMBDA is
  * CodegenFallback, and on d2 it dragged the whole signature
  * projection (shingling + minhash kernels included) into interpreted
  * eval. Long→decimal formatting deserves one StringBuilder loop with
  * `doGenCode`, not a per-element lambda interpreter.
  */
case class LongArrayJoin(child: Expression, sep: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_array_join needs array<bigint>, got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "long_array_join"

  def join(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 12)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(sep)
      sb.append(a.getLong(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    join(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("joiner", this, classOf[LongArrayJoin].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.join($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongArrayJoin {
  def apply(a: Column, sep: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(LongArrayJoin(
      org.apache.spark.sql.GraftColumnBridge.expression(a), sep))
}
