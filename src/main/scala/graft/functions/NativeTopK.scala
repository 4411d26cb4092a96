package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k-by-score aggregate — the Catalyst
  * `TypedImperativeAggregate` twin of [[TopKAgg.topKByScore]].
  *
  * Same semantics (k best by score descending, ties to the smaller
  * id; each task holds ≤4k entries per group; partials merge
  * map-side), but `update` reads the two input fields straight off
  * the `InternalRow` and the buffer serializes as one length-prefixed
  * byte array. The udaf-wrapped `Aggregator` pays a product-encoder
  * conversion per INPUT ROW plus kryo on every partial — measured on
  * n5's 400M-row scored relation at the 400k-vector probe, that
  * per-row tax WAS the query (the scoring projection itself is
  * seconds). Input-side cost is what an aggregate over a pair-join
  * relation lives or dies by; TopKAggEquivalenceSpec pins this
  * expression ≡ the Aggregator on random data and under merge-order
  * permutation.
  */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  // update() reads the evaluated inputs as Double/Long; checking the
  // declared types makes a float/decimal/int input fail at ANALYSIS
  // time with a clear message instead of a runtime ClassCastException
  // inside the aggregate (callers cast explicitly — this aggregate
  // runs on pair-join-sized inputs where an implicit per-row cast
  // should be a visible plan choice, not an analyzer insertion)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE score, BIGINT id) inputs, got " +
        s"(${score.dataType.sql}, ${id.dataType.sql}) — cast explicitly")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  private val ord = Ordering.by[(Double, Long), (Double, Long)] {
    case (s, i) => (-s, i)
  }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

  private def trim(b: mutable.ArrayBuffer[(Double, Long)]): Unit =
    if (b.length > k) {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(
      b: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      b += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (b.length >= 4 * k) trim(b)
    }
    b
  }

  override def merge(
      x: mutable.ArrayBuffer[(Double, Long)],
      y: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    x ++= y
    trim(x)
    x
  }

  override def eval(b: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(b.sorted(ord).take(k).map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(b: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.length * 16)
    bb.putInt(b.length)
    b.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new mutable.ArrayBuffer[(Double, Long)](n)
    (0 until n).foreach { _ =>
      val s = bb.getDouble; val i = bb.getLong
      b += ((s, i))
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "graft_top_k_by_score"
}

object NativeTopK {
  /** `df.groupBy(g).agg(topNeighbors(k, scoreCol, idCol).as("top"))` →
    * `top`: array of k (id, score) structs in (score desc, id) rank
    * order — same ranking as [[TopKAgg.topNeighbors]], native input
    * path.
    */
  def topNeighbors(k: Int, score: Column, id: Column): Column =
    GraftColumnBridge.column(TopKByScoreAgg(
      GraftColumnBridge.expression(score),
      GraftColumnBridge.expression(id), k).toAggregateExpression())
}
