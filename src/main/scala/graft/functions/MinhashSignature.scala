package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-permutation minhash signature of a
  * shingle-hash array in ONE pass.
  *
  * The composed-builtins form (`array(array_min(transform(hs, ...)) x
  * k)`) walks the input array k times and allocates k intermediate
  * arrays per row; this expression keeps k running minima in a single
  * loop with zero allocation beyond the output, and participates in
  * whole-stage codegen via `doGenCode` — the preferred shape for a
  * custom scalar op (SURVEY §7: custom Expression over UDF).
  *
  * Semantics are identical to the builtin pipeline (same (a·h+b) mod p
  * permutations), so the DuckDB oracle for d2/d3 verifies this code
  * path bit-for-bit.
  */
case class MinhashSignature(
    child: Expression,
    a: Array[Long],
    b: Array[Long],
    p: Long)
  extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    val k = a.length
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  /** Column API: signature with the shared [[graft.llm.Hashing]]
    * permutation constants.
    */
  def apply(hashes: Column, k: Int): Column = {
    val coeffs = graft.llm.Hashing.minhashCoeffs(k)
    org.apache.spark.sql.GraftColumnBridge.column(MinhashSignature(
      org.apache.spark.sql.GraftColumnBridge.expression(hashes),
      coeffs.map(_._1).toArray,
      coeffs.map(_._2).toArray,
      graft.llm.Hashing.MinhashP))
  }
}
