package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.QueryHarness.{spark, sf0001}

/** The stateful streaming sessionizer must agree with the batch
  * window-based `t3_sessionize` query (session counts per user).
  */
class StatefulSessionizeSpec extends AnyFunSuite {

  test("flatMapGroupsWithState sessionization matches the batch formulation") {
    val streaming = StatefulSessionize.runOverEvents(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
      .sortBy(t => (t._1, t._2))
    val batch = StreamingQueries.queries("t3_sessionize")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
      .sortBy(t => (t._1, t._2))
    assert(streaming.toSeq == batch.toSeq)
  }
}
