package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct 28-bit md5 shingle-hash
  * array of a text column in ONE pass over its UTF-8 bytes.
  *
  * Semantically identical to the composed-builtins form pinned by the
  * DuckDB oracle for d2/d3/d4:
  *
  * {{{
  * array_distinct(transform(
  *   sequence(0, greatest(length(text) - W, 0)),
  *   i -> CAST(conv(substr(md5(substring(text, i + 1, W)), 1, 7), 16, 10)
  *        AS BIGINT)))
  * }}}
  *
  * The builtin pipeline allocates a sequence array, a UTF8String per
  * window, a 32-char hex string per md5, and string-parses 7 hex chars
  * back to a long — ~50µs of overhead per shingle that dominates the
  * dedup family's runtime. Here each window is hashed straight from the
  * shared byte buffer (code-point offsets, so multi-byte text matches
  * `substring` exactly), the 28-bit value is read from the first 4
  * digest bytes, and first-occurrence order is kept by an open-addressed
  * long set — the same order `array_distinct` produces.
  */
case class ShingleHashes(child: Expression, width: Int)
  extends UnaryExpression {

  require(width > 0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs string, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** All window hashes in file order (non-distinct): the transform()
    * part of the pinned formulation. Shared by [[ShingleHashes]] and
    * [[WinnowFingerprint]].
    */
  def rawHashes(u: UTF8String, width: Int): Array[Long] = {
    val bytes = u.getBytes
    val nBytes = bytes.length
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx),
    // matching substring()'s character indexing
    val charOff = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if ((bytes(b) & 0xC0) != 0x80) { charOff(nChars) = b; nChars += 1 }
      b += 1
    }
    charOff(nChars) = nBytes
    // windows 0..max(nChars-width, 0) inclusive — the sequence() bound
    val last = math.max(nChars - width, 0)
    val nWin = last + 1
    val md = md5.get()
    val digest = new Array[Byte](16)
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      val startB = if (i < nChars) charOff(i) else nBytes
      val endB = if (i + width >= nChars) nBytes else charOff(i + width)
      md.reset()
      md.update(bytes, startB, endB - startB)
      md.digest(digest, 0, 16)
      out(i) = ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
        ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xffL) >>> 4)
      i += 1
    }
    out
  }

  /** First-occurrence-order distinct (what array_distinct produces),
    * open-addressed: values are 28-bit non-negative, -1 = empty slot.
    */
  def distinctPreservingOrder(h: Array[Long]): Array[Long] = {
    val cap = Integer.highestOneBit(math.max(h.length * 2 - 1, 4)) * 2
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val mask = cap - 1
    val out = new Array[Long](h.length)
    var nOut = 0
    var i = 0
    while (i < h.length) {
      val v = h(i)
      var slot = (java.lang.Long.hashCode(v) & mask)
      var dup = false
      while (table(slot) != -1L && !dup) {
        if (table(slot) == v) dup = true else slot = (slot + 1) & mask
      }
      if (!dup) {
        table(slot) = v
        out(nOut) = v
        nOut += 1
      }
      i += 1
    }
    if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut)
  }

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def compute(u: UTF8String, width: Int): GenericArrayData =
    new GenericArrayData(distinctPreservingOrder(rawHashes(u, width)))

  /** Column API with the catalog's 8-char shingle width. */
  def apply(text: Column, width: Int = 8): Column =
    org.apache.spark.sql.GraftColumnBridge.column(ShingleHashes(
      org.apache.spark.sql.GraftColumnBridge.expression(text), width))
}
