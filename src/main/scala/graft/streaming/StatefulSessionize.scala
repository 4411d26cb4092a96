package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the custom-state primitive the north-star asks for (SURVEY §2 T1
  * note: the reference has no event-time semantics, so this is part of
  * the generic streaming surface, not reference parity).
  *
  * Gap rule: a session closes when >30 min of event time passes
  * between consecutive events of a user (matching the batch
  * `t3_sessionize` query, which the spec uses as the oracle).
  */
object StatefulSessionize {

  case class Event(user_id: Long, event_id: Long, ts_ns: Long)
  case class SessionState(sessionId: Long, lastNs: Long)
  case class SessionRow(user_id: Long, session_id: Long, event_id: Long)

  val GapNs: Long = 30L * 60L * 1000000000L

  /** Assign session ids per user. Events must arrive in ts order per
    * user within the stream (guaranteed for AvailableNow over a sorted
    * static source; real deployments would pre-shuffle by user+ts).
    */
  def assign(
      events: Dataset[Event]): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = it.toSeq.sortBy(e => (e.ts_ns, e.event_id)).map { e =>
            st =
              if (st.lastNs == Long.MinValue || e.ts_ns - st.lastNs > GapNs)
                SessionState(st.sessionId + 1, e.ts_ns)
              else st.copy(lastNs = e.ts_ns)
            SessionRow(user, st.sessionId, e.event_id)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Batch-driven streaming run over the events table: memory sink,
    * AvailableNow; returns (user_id, session_id, n_events).
    */
  def runOverEvents(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.Tables.schemaOf(spark, dir, "events")
    val stream = graft.Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
      .select(col("user_id"), col("event_id"), col("ts_ns"))
      .as[Event]
    val name = "graft_sessionize_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = assign(stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }
}
