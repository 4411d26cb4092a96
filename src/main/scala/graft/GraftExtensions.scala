package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * `minhash_signature(array<bigint>)` — one-pass k=16 minhash with the
  * library's shared permutation constants (see graft.llm.Hashing).
  * `shingle_hashes(string)` — distinct 28-bit md5 8-char-shingle hashes
  * in one pass over the UTF-8 bytes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functionEntries.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def builder: Seq[Expression] => Expression = {
    val coeffs = llm.Hashing.minhashCoeffs(16)
    exprs =>
      functions.MinhashSignature(
        exprs.head,
        coeffs.map(_._1).toArray,
        coeffs.map(_._2).toArray,
        llm.Hashing.MinhashP)
  }

  val minhashSignature: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(
      classOf[functions.MinhashSignature].getName, "minhash_signature"),
    builder)

  private def shingleBuilder: Seq[Expression] => Expression =
    exprs => functions.ShingleHashes(exprs.head, 8)

  val shingleHashes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(
      classOf[functions.ShingleHashes].getName, "shingle_hashes"),
    shingleBuilder)

  private def entry(name: String, clazz: Class[_],
      b: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), b)

  /** Arity-checked builder: a wrong-arity SQL call gets the
    * descriptive IllegalArgumentException (the long_array_join
    * contract), not an IndexOutOfBoundsException from exprs(i). */
  private def arity(name: String, n: Int, sig: String)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments ($sig), got ${exprs.length}")
      b(exprs)
    }

  /** Every graft native expression, SQL-callable. */
  val functionEntries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    minhashSignature,
    shingleHashes,
    entry("winnow_fingerprint", classOf[functions.WinnowFingerprint],
      exprs => functions.WinnowFingerprint(exprs.head, 8, 4)),
    entry("dot_product", classOf[functions.DotProduct],
      arity("dot_product", 2, "array<double>, array<double>")(
        exprs => functions.DotProduct(exprs(0), exprs(1)))),
    entry("pol_line_parse", classOf[functions.PolLineParse],
      exprs => functions.PolLineParse(exprs.head)),
    entry("levenshtein_within", classOf[functions.LevenshteinWithin],
      arity("levenshtein_within", 3, "string, string, int threshold")(
        exprs => functions.LevenshteinWithin(exprs(0), exprs(1), exprs(2)))),
    entry("sorted_intersect_count", classOf[functions.SortedIntersectCount],
      arity("sorted_intersect_count", 2,
        "array<bigint> sorted, array<bigint> sorted")(
        exprs => functions.SortedIntersectCount(exprs(0), exprs(1)))),
    entry("ws_tokens", classOf[functions.WsTokens],
      exprs => functions.WsTokens(exprs.head, lowered = true)),
    entry("long_array_sum", classOf[functions.LongArraySum],
      exprs => functions.LongArraySum(exprs.head)),
    entry("char_hist", classOf[functions.CharHistExpr],
      exprs => functions.CharHistExpr(exprs.head)),
    entry("int_array_l1", classOf[functions.IntArrayL1],
      arity("int_array_l1", 2, "array<int>, array<int>")(
        exprs => functions.IntArrayL1(exprs(0), exprs(1)))),
    entry("long_array_join", classOf[functions.LongArrayJoin],
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"long_array_join expects 2 arguments (array<bigint>, " +
            s"separator string literal), got ${exprs.length}")
        functions.LongArrayJoin(exprs(0), exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            "long_array_join separator must be a STRING literal, " +
              s"got $other")
        })
      }))

  /** Register into an ALREADY-RUNNING session (the extensions class
    * only applies to sessions built with `withExtensions` /
    * `spark.sql.extensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functionEntries.foreach { case (id, _, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, b, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.AsOfJoinStrategy
  }
}
