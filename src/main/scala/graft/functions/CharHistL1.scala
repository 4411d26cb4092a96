package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the exact counting lower bound on edit distance
  * that prunes d16's banded-Levenshtein DP population (round-10
  * verdict item 1): every insert/delete changes one character count
  * (L1 delta ≤ 1) and every substitution changes two (≤ 2), so
  *
  *   lev(a, b) ≥ ceil(L1(hist(a), hist(b)) / 2)
  *
  * for ANY character histogram — including one whose code points are
  * folded into [[CharHist.Buckets]] bins (merging bins only shrinks
  * L1, so the bound stays sound; CharHistBoundSpec pins it on random
  * pairs). A pair with L1 · 5 > 2 · max(len) can therefore never
  * satisfy the dup predicate lev · 5 ≤ max(len) and is dropped before
  * the O(n·thr) DP at a cost of 64 integer subtractions.
  *
  * Split into two expressions so the histogram is computed ONCE per
  * document (corpus side of d16's length-bucket join) rather than once
  * per candidate pair: [[CharHist]] is a per-row projection, [[IntArrayL1]]
  * the per-pair conjunct. Both participate in whole-stage codegen.
  */
case class CharHistExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_hist needs string, got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_hist"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CharHist.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CharHist.compute($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHist {
  /** Histogram bins: code point & (Buckets − 1). 64 bins keeps the
    * per-pair L1 loop at 64 subtractions while separating the full
    * lowercase + digit + punctuation range the documents table uses.
    */
  val Buckets = 64

  /** Column API. */
  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(CharHistExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Folded code-point histogram; ASCII texts stay on raw UTF-8 bytes
    * (a byte < 0x80 IS its code point — same fast path as
    * [[BandedLevenshtein.compute]], and the bins must match lev's edit
    * units, which are code points, for the bound to be sound).
    */
  def compute(s: UTF8String): Array[Int] = {
    val out = new Array[Int](Buckets)
    val bytes = s.getBytes
    val n = bytes.length
    var ascii = true
    var i = 0
    while (i < n) {
      if (bytes(i) < 0) { ascii = false; i = n } else i += 1
    }
    if (ascii) {
      i = 0
      while (i < n) { out(bytes(i) & (Buckets - 1)) += 1; i += 1 }
    } else {
      val cps = s.toString.codePoints().toArray
      i = 0
      while (i < cps.length) { out(cps(i) & (Buckets - 1)) += 1; i += 1 }
    }
    out
  }
}

/** Per-pair L1 distance between two equal-length int arrays — d16's
  * join-condition conjunct (see [[CharHistExpr]]).
  */
case class IntArrayL1(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"int_array_l1 needs (array<int>, array<int>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "int_array_l1"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntArrayL1.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntArrayL1.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntArrayL1 {
  /** Column API. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(IntArrayL1(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var l1 = 0
    var i = 0
    while (i < n) {
      val d = a.getInt(i) - b.getInt(i)
      l1 += (if (d < 0) -d else d)
      i += 1
    }
    // length-mismatched inputs (not produced by CharHist pairs, which
    // are fixed-width) count the tail as pure insertions
    var j = n
    while (j < a.numElements()) { l1 += a.getInt(j); j += 1 }
    j = n
    while (j < b.numElements()) { l1 += b.getInt(j); j += 1 }
    l1
  }
}
