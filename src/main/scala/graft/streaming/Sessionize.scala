package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** one event on a user's stream (epoch-ms event time) */
final case class SessionEvent(user_id: Long, ts_ms: Long)

/** per-user open-session state carried across micro-batches */
final case class SessionState(start: Long, last: Long, n: Long)

/** a closed session */
final case class Session(user_id: Long, session_start: Long, session_end: Long,
    n_events: Long)

/** Streaming gap-based sessionization — the custom-state streaming
  * operator (KeyValueGroupedDataset.flatMapGroupsWithState with
  * event-time timeout): the stateful twin of the batch window-algebra
  * sessionizer (`core_sessionize`). A user's session closes and emits
  * when a later event arrives past the gap, or when the WATERMARK passes
  * (last event + gap) — so state is bounded by active users, not
  * history, which is what lets this run forever on an unbounded stream.
  *
  * Semantics match the batch operator: same gap rule, same
  * (start, end, count) per session. Within one micro-batch the group's
  * rows are sorted by event time (bounded by per-user-per-batch volume);
  * across batches ordering is the watermark's job — events later than
  * the configured delay are dropped by the engine like any late data.
  */
object Sessionize {

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__et", timestamp_millis(col("ts_ms")))
      .withWatermark("__et", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close and emit
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_ms)
            val out = scala.collection.mutable.Buffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur = cur match {
                case Some(st) if e.ts_ms - st.last <= gapMs =>
                  Some(SessionState(st.start, math.max(st.last, e.ts_ms), st.n + 1))
                case Some(st) =>
                  out += Session(user, st.start, st.last, st.n)
                  Some(SessionState(e.ts_ms, e.ts_ms, 1))
                case None =>
                  Some(SessionState(e.ts_ms, e.ts_ms, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.iterator
          }
      }
  }

  /** batch reference semantics over the same events (the equivalence
    * oracle for tests): every session CLOSED by `cutoffTs` — i.e. with
    * last event + gap strictly before it — in (start, end, n) form
    */
  def batchClosedSessions(events: DataFrame, gapMs: Long,
      cutoffTs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    events
      .withColumn("__prev", lag(col("ts_ms"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_ms") - col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__seq",
        sum(col("__new")).over(w.rangeBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__seq"))
      .agg(min(col("ts_ms")).as("session_start"),
        max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"))
      .filter(col("session_end") + gapMs < cutoffTs)
      .drop("__seq")
  }
}
