package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the token-SET digest the incremental
  * dedup family keys on — md5 hex of the space-joined sorted distinct
  * token array.
  *
  * Value-identical to the pinned builtin chain
  * `md5(CAST(array_join(array_sort(array_distinct(a)), ' ') AS BINARY))`
  * for null-free string arrays (the ws_tokens contract): distinct
  * keeps set semantics, the sort is UTF8String binary order (exactly
  * array_sort's natural ordering for strings), the join bytes are the
  * UTF-8 concatenation with single-space separators, and the digest
  * is lowercase-hex MD5 — which is what lets DuckDB's
  * `md5(array_to_string(list_sort(list_distinct(...)), ' '))`
  * reproduce it. The builtin chain's array_sort lambda is
  * CodegenFallback and dragged every digest projection (d11's three,
  * t9's ingest path) interpreted — round-8 audit.
  */
case class SortedTokenDigest(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_token_digest needs array<string>, got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sorted_token_digest"

  def digest(a: ArrayData): UTF8String = {
    val n = a.numElements()
    // sort-then-dedupe-adjacent beats a TreeSet: one flat array, no
    // per-token node allocation, branch-friendly comparisons
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      if (t != null) { toks(m) = t; m += 1 }
      i += 1
    }
    java.util.Arrays.sort(toks, 0, m,
      null: java.util.Comparator[UTF8String]) // natural = binary order
    var len = 0
    var k = 0
    i = 0
    while (i < m) {
      if (i == 0 || toks(i).compareTo(toks(i - 1)) != 0) {
        toks(k) = toks(i); k += 1
        len += toks(i).numBytes() + 1
      }
      i += 1
    }
    val joined = new Array[Byte](math.max(len - 1, 0))
    var pos = 0
    i = 0
    while (i < k) {
      if (i > 0) { joined(pos) = ' '; pos += 1 }
      val t = toks(i)
      t.writeToMemory(joined,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
      pos += t.numBytes()
      i += 1
    }
    val md = SortedTokenDigest.md5.get()
    md.reset()
    val d = md.digest(joined)
    val hex = new Array[Byte](32)
    val digits = SortedTokenDigest.HexDigits
    i = 0
    while (i < 16) {
      hex(i * 2) = digits((d(i) >> 4) & 0xf)
      hex(i * 2 + 1) = digits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  override def nullSafeEval(input: Any): Any =
    digest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("digester", this,
      classOf[SortedTokenDigest].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.digest($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedTokenDigest {
  // per-row JCE provider lookups are a measurable fraction of this
  // deliberately tight loop — one MessageDigest per task thread
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits: Array[Byte] = "0123456789abcdef".getBytes

  def apply(a: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(SortedTokenDigest(
      org.apache.spark.sql.GraftColumnBridge.expression(a)))
}
