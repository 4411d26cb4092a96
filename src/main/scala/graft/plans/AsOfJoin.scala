package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator — the one operator family the
  * reference-shaped workload needs that Spark's built-ins can't express
  * as a single relational node (SURVEY §2 R11; pandas `merge_asof` is
  * the reference semantics): for every left row, attach the LAST right
  * row of the same key whose time is <= the left row's time, or nulls.
  *
  * Built exactly along the extension ladder the engine design calls
  * for: a custom [[AsOfJoinPlan]] logical node, planned by
  * [[AsOfJoinStrategy]] (registered through `SparkSessionExtensions`,
  * see [[graft.GraftExtensions]]) into [[AsOfJoinExec]], a physical
  * node that declares `ClusteredDistribution` on the key and a
  * `(key, time)` sort for BOTH children — so EnsureRequirements plans
  * ONE hash shuffle per side (none at all if the sides are already
  * co-partitioned, e.g. bucketed tables), and the join itself is a
  * single forward merge pass per partition with O(1) state: no range
  * probe, no window re-scan, no per-key buffering. That is the plan
  * shape that survives 100 TB — the composed running-max-window
  * alternative (kept as the r11 catalog query) needs the same shuffle
  * but buffers whole partitions in the window operator.
  *
  * Column pruning does not see through a custom node, so callers
  * pre-project the two sides (the public [[AsOf.join]] API takes
  * already-projected frames and rejects name collisions).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    direction: String = "backward",
    tolerance: Option[Long] = None)
  extends BinaryNode {

  require(direction == "backward" || direction == "forward",
    s"asof direction must be backward|forward, got $direction")

  /** Left columns as-is; every right column nullable (miss → nulls). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, dir, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    direction: String,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-cluster both sides on the key … */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** … and sort each partition by (key, time): the merge is one
    * forward pass.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lkOrd = leftOut.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = rightOut.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = rightOut.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time attributes must come from the respective child")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val nRight = rightOut.size
    val outputSchema = output

    val dirForward = direction == "forward"
    val tol = tolerance
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    // tolerance needs a numeric time delta: integral-backed types only
    if (tol.isDefined) {
      import org.apache.spark.sql.types._
      require(Seq(LongType, IntegerType, ShortType, ByteType,
        TimestampType, TimestampNTZType, DateType).contains(timeType),
        s"asof tolerance needs an integral-backed time column, got $timeType")
    }
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalStateException(s"unexpected time $other")
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
      val lk = BoundReference(lkOrd, keyType, nullable = true)
      val lt = BoundReference(ltOrd, timeType, nullable = true)
      val rk = BoundReference(rkOrd, keyType, nullable = true)
      val rt = BoundReference(rtOrd, timeType, nullable = true)
      val project = UnsafeProjection.create(outputSchema, outputSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIter.buffered

      var cur: InternalRow = null // backward: last right row <= lTime
      var curKey: Any = null
      var curTime: Any = null

      // backward: consume every right row with (key < lKey) or
      // (key == lKey && time <= lTime), remembering the last same-key one
      def advanceBackward(lKey: Any, lTime: Any): Unit = {
        var continue = true
        while (continue && rBuf.hasNext) {
          val head = rBuf.head
          val hKey = rk.eval(head)
          if (hKey == null) rBuf.next() // null keys never match; skip
          else {
            val cmp = keyOrdering.compare(hKey, lKey)
            if (cmp < 0) { rBuf.next(); cur = null; curKey = null }
            else if (cmp == 0) {
              val hTime = rt.eval(head)
              if (hTime == null) rBuf.next() // sorts first, never matches
              else if (timeOrdering.compare(hTime, lTime) <= 0) {
                cur = rBuf.next().copy() // rows are reused by the iterator
                curKey = hKey
                curTime = hTime
              } else continue = false
            } else continue = false
          }
        }
      }

      // forward: discard right rows strictly before lTime (no later left
      // row wants them — left times are nondecreasing per key); the
      // candidate is the un-consumed head, shared by later left rows
      def advanceForward(lKey: Any, lTime: Any): InternalRow = {
        var continue = true
        while (continue && rBuf.hasNext) {
          val head = rBuf.head
          val hKey = rk.eval(head)
          if (hKey == null) rBuf.next()
          else {
            val cmp = keyOrdering.compare(hKey, lKey)
            if (cmp < 0) rBuf.next()
            else if (cmp == 0) {
              val hTime = rt.eval(head)
              if (hTime == null) rBuf.next()
              else if (timeOrdering.compare(hTime, lTime) < 0) rBuf.next()
              else continue = false
            } else continue = false
          }
        }
        if (rBuf.hasNext) {
          val head = rBuf.head
          val hKey = rk.eval(head)
          if (hKey != null && keyOrdering.compare(hKey, lKey) == 0) {
            val hTime = rt.eval(head)
            if (hTime != null &&
              tol.forall(t => asLong(hTime) - asLong(lTime) <= t)) head
            else null
          } else null
        } else null
      }

      lIter.map { lRow =>
        numOutputRows += 1
        val lKey = lk.eval(lRow)
        val lTime = lt.eval(lRow)
        if (lKey == null || lTime == null) {
          project(joined(lRow, nullRight))
        } else if (dirForward) {
          val m = advanceForward(lKey, lTime)
          if (m != null) numMatched += 1
          project(joined(lRow, if (m != null) m else nullRight))
        } else {
          advanceBackward(lKey, lTime)
          val matched = cur != null && curKey != null &&
            keyOrdering.compare(curKey, lKey) == 0 &&
            tol.forall(t => asLong(lTime) - asLong(curTime) <= t)
          if (matched) numMatched += 1
          project(joined(lRow, if (matched) cur else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API. */
object AsOf {

  /** `left ASOF JOIN right ON key, time` (left outer, pandas
    * `merge_asof`): every left row picks the right row of the same key
    * nearest in time — `direction="backward"` (default) takes the LAST
    * right row with `rightTime <= leftTime`, `"forward"` the FIRST with
    * `rightTime >= leftTime`; nulls on miss. `tolerance` bounds the
    * time gap in the time column's native unit (micros for timestamps,
    * days for dates — integral-backed types only). Column names must
    * not collide across the two sides — pre-project/alias the frames
    * (this also keeps the scan pruned, since pruning does not cross a
    * custom node).
    */
  def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"asof join output would have duplicate columns: ${dup.mkString(", ")}")
    val lp = GraftColumnBridge.analyzed(left)
    val rp = GraftColumnBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    GraftColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime), direction, tolerance))
  }
}
