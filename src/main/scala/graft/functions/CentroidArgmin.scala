package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid scan over a LITERAL codebook — the native kernel
  * behind `KMeans.assignColOn` (IVF assignment, SemDeDup clustering,
  * and the 4-subspace PQ encode).
  *
  * Why an expression instead of composed builtins: the builtin twin
  * (`least` over k d² columns + a first-match CASE — see
  * `KMeans.assignColOnBuiltins`) expands after optimizer collapse into
  * a ~3000-node tree PER SUBSPACE (each d² duplicated into the `least`
  * and every CASE arm), which N9Probe measured at ~17 µs/row — the
  * generated/interpreted code is too large for JIT and the PQ encode
  * of 400k vectors took ~20 s for ~0.2 GFLOP of real work. This kernel
  * is the same arithmetic as ONE tight loop: k·dim multiply-adds plus
  * a k-wide argmin, JIT-friendly in codegen and allocation-light
  * interpreted.
  *
  * Bit-exactness contract (what keeps the DuckDB oracles green):
  *  - d²_i = ee − 2.0·dot(e, c_i) + cc_i, with dot the SEQUENTIAL
  *    left fold of [[DotProduct]] and cc_i the driver-side self-dot
  *    folded in the same order — identical IEEE operation sequence to
  *    the builtin twin and to DuckDB's `list_inner_product`.
  *  - min follows codegen'd `least` semantics: nulls skipped, NaN
  *    sorts GREATER than every double, −0.0 equals 0.0, and on equal
  *    keys the FIRST (smallest cid — centroids scan in ascending cid
  *    order) wins.
  *  - cid is the first centroid whose d² equals min under SPARK
  *    equality (the CASE `===` arm): NaN equals NaN, so an all-NaN
  *    row resolves to the smallest cid; an all-null d² (null or
  *    wrong-length vector) yields −1, the twin's CASE fallback.
  *
  * The codebook rides along as structural-equality `IndexedSeq`s (not
  * arrays) so optimizer-copied instances stay `equals`-identical and
  * common-subexpression elimination still dedupes the cid/d² pair.
  */
trait CentroidScanBase extends BinaryExpression {
  /** Centroid ids, ascending. */
  def cids: IndexedSeq[Long]
  /** Row-major k×dim centroid matrix, same order as [[cids]]. */
  def flat: IndexedSeq[Double]
  /** Per-centroid self-dot (sequential fold), same order. */
  def cc: IndexedSeq[Double]
  def dim: Int

  protected def k: Int = cids.length

  @transient protected lazy val flatArr: Array[Double] = flat.toArray
  @transient protected lazy val ccArr: Array[Double] = cc.toArray
  @transient protected lazy val cidArr: Array[Long] = cids.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        if (flat.length == k * dim && cc.length == k && k > 0)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"codebook shape mismatch: k=$k dim=$dim flat=${flat.length} cc=${cc.length}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"centroid scan needs (array<double>, double), got $other")
    }

  /** `least`-order strict less-than: NaN greatest, −0.0 == 0.0. */
  protected final def nanSafeLt(x: Double, y: Double): Boolean =
    !java.lang.Double.isNaN(x) &&
      (java.lang.Double.isNaN(y) || x < y)

  /** Shared interpreted kernel: (minSet, minD2, cid). */
  protected final def scan(input: InternalRow): (Boolean, Double, Long) = {
    val eAny = left.eval(input)
    val eeAny = right.eval(input)
    if (eAny == null || eeAny == null) return (false, 0.0, -1L)
    val arr = eAny.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return (false, 0.0, -1L)
    val ee = eeAny.asInstanceOf[Double]
    val d2s = new Array[Double](k)
    var min = 0.0
    var minSet = false
    var i = 0
    while (i < k) {
      var dot = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) { dot += arr.getDouble(j) * flatArr(base + j); j += 1 }
      val d2 = ee - 2.0 * dot + ccArr(i)
      d2s(i) = d2
      if (!minSet || nanSafeLt(d2, min)) { min = d2; minSet = true }
      i += 1
    }
    var cid = -1L
    i = 0
    while (i < k && cid == -1L) {
      // Spark `===` on doubles: NaN equals NaN (min is NaN only when
      // every d2 is — any finite d2 sorts below NaN in pass 1)
      if (d2s(i) == min ||
        (java.lang.Double.isNaN(d2s(i)) && java.lang.Double.isNaN(min)))
        cid = cidArr(i)
      i += 1
    }
    (minSet, min, cid)
  }

  /** Generates the shared scan; returns (code, minSetVar, minVar,
    * cidVar) for the subclass to pick its output from.
    */
  protected final def genScan(ctx: CodegenContext): (String, String, String, String) = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val flatRef = ctx.addReferenceObj("cents", flatArr, "double[]")
    val ccRef = ctx.addReferenceObj("cc", ccArr, "double[]")
    val cidRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val d2s = ctx.addMutableState("double[]", "d2s",
      v => s"$v = new double[$k];")
    val minSet = ctx.freshName("minSet")
    val min = ctx.freshName("min")
    val cid = ctx.freshName("cid")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val dot = ctx.freshName("dot")
    val d2 = ctx.freshName("d2")
    val code =
      s"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean $minSet = false;
         |double $min = 0.0;
         |long $cid = -1L;
         |if (!${leftGen.isNull} && !${rightGen.isNull} &&
         |    ${leftGen.value}.numElements() == $dim) {
         |  for (int $i = 0; $i < $k; $i++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += ${leftGen.value}.getDouble($j) * $flatRef[$i * $dim + $j];
         |    }
         |    double $d2 = ${rightGen.value} - 2.0 * $dot + $ccRef[$i];
         |    $d2s[$i] = $d2;
         |    if (!$minSet || (!Double.isNaN($d2) &&
         |        (Double.isNaN($min) || $d2 < $min))) {
         |      $min = $d2; $minSet = true;
         |    }
         |  }
         |  for (int $i = 0; $i < $k; $i++) {
         |    if ($d2s[$i] == $min || (Double.isNaN($d2s[$i]) &&
         |        Double.isNaN($min))) { $cid = $cidRef[$i]; break; }
         |  }
         |}
       """.stripMargin
    (code, minSet, min, cid)
  }
}

/** First centroid id at minimum d² (−1 when every d² is null/NaN) —
  * never null, so IVF partition keys stay clean.
  */
case class CentroidArgminCid(left: Expression, right: Expression,
    cids: IndexedSeq[Long], flat: IndexedSeq[Double],
    cc: IndexedSeq[Double], dim: Int)
  extends CentroidScanBase {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "centroid_argmin_cid"
  override def eval(input: InternalRow): Any = scan(input)._3
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (code, _, _, cid) = genScan(ctx)
    ev.copy(
      code = code"""${code}long ${ev.value} = $cid;""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Minimum d² over the codebook (`least` semantics); null when the
  * vector is null/mis-sized.
  */
case class CentroidMinD2(left: Expression, right: Expression,
    cids: IndexedSeq[Long], flat: IndexedSeq[Double],
    cc: IndexedSeq[Double], dim: Int)
  extends CentroidScanBase {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_min_d2"
  override def eval(input: InternalRow): Any = {
    val (set, min, _) = scan(input)
    if (set) min else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (code, minSet, min, _) = genScan(ctx)
    ev.copy(code =
      code"""
         |$code
         |boolean ${ev.isNull} = !$minSet;
         |double ${ev.value} = $min;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidScan {
  /** Builds both outputs against a (cid, centroid) codebook; callers
    * wrap them in `struct(...)` so downstream `.getField` pruning
    * drops the d² work entirely when only the cid is read.
    */
  def exprs(cents: Seq[(Long, Array[Double])], e: Column, ee: Column): (Column, Column) = {
    require(cents.nonEmpty, "empty codebook")
    val byCid = cents.sortBy(_._1)
    val dim = byCid.head._2.length
    require(byCid.forall(_._2.length == dim), "ragged codebook")
    val cids = byCid.map(_._1).toIndexedSeq
    val flat = byCid.flatMap(_._2).toIndexedSeq
    val cc = byCid.map { case (_, c) =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }.toIndexedSeq
    val le = org.apache.spark.sql.GraftColumnBridge.expression(e)
    val re = org.apache.spark.sql.GraftColumnBridge.expression(ee)
    (org.apache.spark.sql.GraftColumnBridge.column(
      CentroidMinD2(le, re, cids, flat, cc, dim)),
      org.apache.spark.sql.GraftColumnBridge.column(
        CentroidArgminCid(le, re, cids, flat, cc, dim)))
  }
}
