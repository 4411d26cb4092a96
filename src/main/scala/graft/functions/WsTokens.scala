package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace tokenization in one pass —
  * the text family's universal first stage, semantically identical to
  * the composed-builtins tree pinned by the DuckDB oracles:
  *
  * {{{ filter(split(lower(text), '\\s+'), x -> x <> '') }}}
  *
  * (or without the lower() for the case-preserving callers). The
  * builtin tree is interpreted twice over: `split` round-trips the
  * UTF8String through java.util.regex, and the `filter` lambda is a
  * HigherOrderFunction — CodegenFallback — which drags the WHOLE
  * projection it appears in out of whole-stage codegen (the recurring
  * ~20×-per-row cliff CodegenAudit exists to catch; this tree sat in
  * 15 catalog queries' hot projections). Here: one lowercase through
  * the SAME entry point Spark's Lower codegen calls for the default
  * collation (see the kernel's sigma note), then a byte-level
  * split on Java-regex `\s` = ASCII [ \t\n\x0B\f\r] — each of which
  * is a single UTF-8 byte that can never equal a continuation byte,
  * so the byte scan is multibyte-safe — with empty tokens never
  * materialized (what the filter lambda did). NBSP and other Unicode
  * spaces stay INSIDE tokens, exactly like Java's default (non-
  * UNICODE_CHARACTER_CLASS) `\s`.
  */
case class WsTokens(child: Expression, lowered: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_tokens needs string, got $other")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_tokens"

  // resolved ONCE on the driver, like Lower's own lazy `useICU`
  // field: Spark's lower() maps case per-codepoint through ICU when
  // spark.sql.icu.caseMappings.enabled is on (the 4.x default) and
  // through JVM String case mapping otherwise — the two disagree on
  // Greek capital sigma in word-final position (σ vs ς), which the
  // 400-string property spec caught. The flag rides the serialized
  // expression to executors, same as Lower.
  private lazy val useICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  override def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String], lowered, useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokens.compute($c, $lowered, $useICU);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokens {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def compute(input: UTF8String, lowered: Boolean,
      useICU: Boolean): GenericArrayData = {
    // the UTF8_BINARY collation id is 0; exec(_, 0, useICU) is the
    // exact call Lower's codegen emits for the default collation
    val s =
      if (lowered)
        org.apache.spark.sql.catalyst.util.CollationSupport.Lower
          .exec(input, 0, useICU)
      else input
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API; `lowered = true` is the catalog's standard form. */
  def apply(text: Column, lowered: Boolean = true): Column =
    org.apache.spark.sql.GraftColumnBridge.column(WsTokens(
      org.apache.spark.sql.GraftColumnBridge.expression(text), lowered))
}
