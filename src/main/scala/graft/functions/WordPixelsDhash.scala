package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: m5's stub-decode + dHash stage in one
  * codegen call — 65 per-token "pixels" ((numChars·31 + first code
  * point) mod 256 over the single-space split, ''-padded/truncated to
  * 65), then 64 adjacent-pixel gradient bits packed into two 32-bit
  * halves, returned as struct(lo BIGINT, hi BIGINT).
  *
  * Value-identical to the composed-builtins chain it replaces
  * (split → pad → slice → transform pixel → 2 aggregate folds), which
  * is pinned in FunctionsSpec — four corpus-sized projections of HOF
  * lambdas were CodegenFallback (round-8 audit), and the hash stage
  * dominated m5's 4M probe. Split semantics mirror the builtin
  * `split(text, ' ')` (Java split with limit -1: trailing empties
  * kept, empty input yields one empty token); `length`/`ascii`
  * semantics mirror the builtins (code points, not code units).
  */
case class WordPixelsDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_pixels_dhash needs string, got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_pixels_dhash"

  private val NPix = 65

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val p = new Array[Int](NPix)
    var i = 0
    val n = math.min(toks.length, NPix)
    while (i < n) {
      val t = toks(i)
      if (t.nonEmpty)
        p(i) = (t.codePointCount(0, t.length) * 31 + t.codePointAt(0)) % 256
      i += 1
    }
    var lo = 0L
    var hi = 0L
    i = 0
    while (i < 32) {
      if (p(i) < p(i + 1)) lo |= 1L << i
      if (p(i + 32) < p(i + 33)) hi |= 1L << i
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lo, hi))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dhash", this, classOf[WordPixelsDhash].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPixelsDhash {
  def apply(a: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(WordPixelsDhash(
      org.apache.spark.sql.GraftColumnBridge.expression(a)))
}
