package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprint — the
  * DISTINCT set of rolling minima over `win`-sized windows of the
  * `width`-char shingle-hash stream — computed per row in one pass.
  *
  * Equivalent to the posexplode + window-function formulation pinned by
  * the x4 oracle:
  *
  * {{{
  *   min(h) OVER (PARTITION BY doc_id ORDER BY i
  *                ROWS BETWEEN CURRENT ROW AND win-1 FOLLOWING)
  *   ... then DISTINCT per doc
  * }}}
  *
  * but with no explode and no shuffle: the window min is a per-document
  * streaming computation, so a whole-table fingerprint pass stays
  * map-only — the exploded formulation shuffles |docs|×|chars| rows,
  * which at 100 TB is the difference between a scan and a cluster-wide
  * sort. Tail windows shrink (ROWS ... FOLLOWING clips at the
  * partition edge), matching the window-function semantics exactly.
  * Output order is first-occurrence (order-insensitive aggregates are
  * applied on top).
  */
case class WinnowFingerprint(child: Expression, width: Int, win: Int)
  extends UnaryExpression {

  require(width > 0 && win > 0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprint needs string, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], width, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprint.compute($c, $width, $win);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Per-row kernel: rolling min over shrinking-tail windows, then
    * first-occurrence distinct.
    */
  def compute(u: UTF8String, width: Int, win: Int): GenericArrayData = {
    val h = ShingleHashes.rawHashes(u, width)
    val n = h.length
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      var m = h(i)
      var j = i + 1
      val end = math.min(i + win, n)
      while (j < end) {
        if (h(j) < m) m = h(j)
        j += 1
      }
      fps(i) = m
      i += 1
    }
    new GenericArrayData(ShingleHashes.distinctPreservingOrder(fps))
  }

  /** Column API with the catalog's shingle width 8 / window 4. */
  def apply(text: Column, width: Int = 8, win: Int = 4): Column =
    org.apache.spark.sql.GraftColumnBridge.column(WinnowFingerprint(
      org.apache.spark.sql.GraftColumnBridge.expression(text), width, win))
}
