package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the P1 permissive line parse
  * (`etl/transform.py:61-95`) in one pass over the line's bytes —
  * `struct<game_win bigint, type_code string>`.
  *
  * Tokenization is the reference's `line.split()`: runs of ASCII
  * whitespace separate tokens, leading/trailing whitespace produces no
  * empty tokens. (The previous composed form — `split(trim(line),
  * '\\s+')` — left an empty first token on lines starting with a tab,
  * dropping rows Python keeps; this kernel matches Python. Non-ASCII
  * unicode whitespace is not a separator in either the Java regex or
  * here — a deliberate, documented deviation from Python's str.split.)
  *
  * Numeric parsing is a strict sign+digits scan with Long.parseLong's
  * overflow handling — the accept set of ANSI `try_cast(x AS LONG)` on
  * a whitespace-free token ('5.0' and '1_0' rejected, '+5'/'-4'/'007'
  * accepted, out-of-range null), matching both the pinned composed
  * formulation and Python int() on the reference corpus. (Difference
  * pocket: the composed form's ANSI `+` THROWS when win+extra
  * overflows Long; the kernel wraps. No real pool line is within 10
  * orders of magnitude of that.) Scanning stops after the third token:
  * extra tokens are ignored by the reference, so the kernel never
  * materializes them.
  */
case class PolLineParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pol_line_parse needs string, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("game_win", LongType, nullable = true),
    StructField("type_code", StringType, nullable = true)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pol_line_parse"

  override def nullSafeEval(input: Any): Any =
    PolLineParse.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolLineParse.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolLineParse {

  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 9 && b <= 13) // \t \n \x0B \f \r — the \s set

  /** Strict long parse of bytes[s, e): optional sign + decimal digits,
    * Long.parseLong's negative-accumulation overflow handling. Returns
    * boxed Long, or null on reject — the ANSI try_cast accept set for
    * a whitespace-free token.
    */
  private def parseLong(bytes: Array[Byte], s: Int, e: Int): java.lang.Long = {
    if (s >= e) return null
    var i = s
    var negative = false
    val first = bytes(i)
    if (first == '-' || first == '+') { negative = first == '-'; i += 1 }
    if (i >= e) return null
    var acc = 0L
    val limit = if (negative) Long.MinValue else -Long.MaxValue
    val mulMin = limit / 10
    while (i < e) {
      val b = bytes(i)
      if (b < '0' || b > '9') return null
      if (acc < mulMin) return null // overflow
      acc *= 10
      val d = b - '0'
      if (acc < limit + d) return null // overflow
      acc -= d
      i += 1
    }
    java.lang.Long.valueOf(if (negative) acc else -acc)
  }

  /** Per-row kernel (shared by interpreted eval and codegen). */
  def compute(u: UTF8String): InternalRow = {
    val bytes = u.getBytes
    val n = bytes.length
    // first three token byte-ranges
    val starts = new Array[Int](3)
    val ends = new Array[Int](3)
    var nTok = 0
    var i = 0
    while (i < n && nTok < 3) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        starts(nTok) = i
        while (i < n && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    val v0 = if (nTok > 0) parseLong(bytes, starts(0), ends(0)) else null
    if (v0 != null) {
      var win = v0.longValue()
      if (nTok > 2) {
        val v2 = parseLong(bytes, starts(2), ends(2))
        if (v2 != null) win += v2.longValue()
      }
      row.setLong(0, win)
    } else row.setNullAt(0)
    if (nTok > 1)
      row.update(1, UTF8String.fromBytes(bytes, starts(1), ends(1) - starts(1)))
    else row.setNullAt(1)
    row
  }

  def apply(line: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(PolLineParse(
      org.apache.spark.sql.GraftColumnBridge.expression(line)))
}
