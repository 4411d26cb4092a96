package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the five repetition COUNTS of a token
  * array in one pass — `struct(n, ndist, nbig, ndistbig, maxc)` =
  * (tokens, distinct tokens, bigrams, distinct bigrams, highest
  * single-token count). x5's fractions stay ORDINARY Spark arithmetic
  * over these counts, so rounding/null/division semantics never leave
  * the engine; what the kernel replaces is the SHAPE of getting the
  * counts:
  *
  *  - `size(array_distinct(toks))` and the bigram
  *    `transform`+`array_distinct` — interpreted lambdas per row;
  *  - the top-token path — an EXPLODE of every token, two hash
  *    aggregations, and a corpus-sized doc-keyed join back.
  *
  * With the counts computed per row, x5 is map-only: no explode, no
  * shuffle, no join — the plan a 100 TB corpus wants. Distinctness is
  * EXACT (hash sets over the token strings; bigrams keyed by the same
  * `concat(tok_i, ' ', tok_{i+1})` string the builtin built — tokens
  * are whitespace-split so the space-join is injective).
  */
case class TokenRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_rep_stats needs array<string>, got $other")
    }
  override def dataType: DataType = TokenRepStats.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_rep_stats"

  override def nullSafeEval(input: Any): Any =
    TokenRepStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenRepStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenRepStats {

  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("ndist", IntegerType, nullable = false),
    StructField("nbig", IntegerType, nullable = false),
    StructField("ndistbig", IntegerType, nullable = false),
    StructField("maxc", IntegerType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** Per-row kernel, shared by interpreted eval and codegen. */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var maxc = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(a.getUTF8String(i), Integer.valueOf(1),
        (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
      if (c > maxc) maxc = c.intValue
      i += 1
    }
    val nbig = math.max(n - 1, 0)
    var ndistbig = 0
    if (nbig > 0) {
      val bset = new java.util.HashSet[UTF8String](nbig * 2)
      var j = 0
      while (j < n - 1) {
        bset.add(UTF8String.concat(
          a.getUTF8String(j), Space, a.getUTF8String(j + 1)))
        j += 1
      }
      ndistbig = bset.size()
    }
    new GenericInternalRow(
      Array[Any](n, counts.size(), nbig, ndistbig, maxc))
  }

  def apply(toks: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(TokenRepStats(
      org.apache.spark.sql.GraftColumnBridge.expression(toks)))
}
