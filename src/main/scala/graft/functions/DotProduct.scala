package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: left-fold dot product of two
  * array<double> columns.
  *
  * Bit-identical to the pinned builtin formulation
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * for equal-length null-free arrays (the embeddings contract): a tight
  * index-order loop IS the left fold, and IEEE double addition is
  * performed in the same sequence — which is what lets the DuckDB
  * oracle (`list_inner_product`, also sequential) reproduce cosine
  * scores exactly.
  *
  * The builtin form allocates a zipped array per pair and boxes every
  * element through the lambda interpreter; on an all-pairs similarity
  * join that dominates the operator (observed ~10× on d6). Arrays of
  * unequal length fall back to the zip_with null-padding result (null),
  * matching the builtin.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs (array<double>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(DotProduct(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
