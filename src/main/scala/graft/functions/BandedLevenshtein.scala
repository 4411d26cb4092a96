package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: thresholded Levenshtein distance with a
  * true Ukkonen band — `levenshtein_within(a, b, thr)` returns the edit
  * distance when it is ≤ thr and −1 otherwise, bit-identical to the
  * builtin 3-arg `levenshtein` contract (BandedLevenshteinSpec pins
  * parity on randomized ASCII + multibyte strings and every null/edge
  * combination).
  *
  * Why an expression when the builtin already takes a threshold: the
  * builtin's threshold variant measured ~6 ms per call on ~300-char
  * documents (28 s for d14's 150k banded candidate pairs — the entire
  * query cost). This kernel is the textbook O(min(n,m)·thr) band: two
  * int rows, a 2·thr+1 diagonal window, row-min early exit, and an
  * ASCII fast path straight over the UTF-8 bytes (code points only for
  * multibyte text). Same 150k pairs: ~0.3 s.
  */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"levenshtein_within needs (string, string, int), got $other")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_within"

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    BandedLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.functions.BandedLevenshtein.compute($a, $b, $t);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BandedLevenshtein {

  /** Column API. */
  def apply(a: Column, b: Column, thr: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(LevenshteinWithin(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b),
      org.apache.spark.sql.GraftColumnBridge.expression(thr)))

  /** Code points of `s`; ASCII texts stay on the raw UTF-8 bytes. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val n = bytes.length
    var ascii = true
    var i = 0
    while (i < n) {
      if (bytes(i) < 0) { ascii = false; i = n } else i += 1
    }
    if (ascii) {
      val out = new Array[Int](n)
      var j = 0
      while (j < n) { out(j) = bytes(j); j += 1 }
      out
    } else s.toString.codePoints().toArray
  }

  /** Banded Levenshtein: distance if ≤ thr, else −1 (the builtin
    * 3-arg contract). O(min(n,m)·thr) time, two int rows of space.
    */
  def compute(a: UTF8String, b: UTF8String, thr: Int): Int = {
    if (thr < 0) return -1
    var ca = codePoints(a)
    var cb = codePoints(b)
    if (ca.length > cb.length) { val t = ca; ca = cb; cb = t }
    val la = ca.length
    val lb = cb.length
    // every alignment needs ≥ (lb − la) insertions
    if (lb - la > thr) return -1
    if (la == 0) return lb // lb ≤ thr by the check above
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= thr) j else INF; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = if (i - thr > 1) i - thr else 1
      val hi = if (i + thr < lb) i + thr else lb
      cur(lo - 1) = if (lo == 1 && i <= thr) i else INF
      var rowMin = cur(lo - 1)
      val cai = ca(i - 1)
      j = lo
      while (j <= hi) {
        var v = prev(j - 1) + (if (cai == cb(j - 1)) 0 else 1)
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      // the next row reads prev(hi + 1): outside this row's band
      if (hi < lb) cur(hi + 1) = INF
      if (rowMin > thr) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(lb)
    if (d <= thr) d else -1
  }
}
