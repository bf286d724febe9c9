package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization.
  *
  * The streaming twin of [[graft.operators.Sessions]]: sessions are
  * carried as per-user state across micro-batches with
  * `flatMapGroupsWithState` + an event-time timeout. A session closes
  * (and its summary row is emitted) when the watermark passes its last
  * event plus the gap — so output is final, late events inside the
  * watermark still extend their session, and state is evicted by the
  * timeout instead of growing forever (the same
  * watermark-bounds-the-state contract as the candle MV).
  */
object StreamingSessions {

  final case class SessionEvent(user: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(start: Long, last: Long, events: Long, value: Double)
  final case class SessionRow(user: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, events: Long,
                              span_seconds: Long, value_sum: Double)

  def update(gapMs: Long)(user: Long, events: Iterator[SessionEvent],
             state: GroupState[OpenSession]): Iterator[SessionRow] = {
    def row(s: OpenSession): SessionRow =
      SessionRow(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
        s.events, (s.last - s.start) / 1000L, s.value)
    if (state.hasTimedOut) {
      // watermark passed last + gap: the session is final
      val out = state.getOption.map(row).iterator
      state.remove()
      out
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionRow]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(OpenSession(s.start, math.max(s.last, t),
              s.events + 1, s.value + e.value))
          case Some(s) =>
            closed ::= row(s)
            cur = Some(OpenSession(t, t, 1, e.value))
          case None =>
            cur = Some(OpenSession(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.reverseIterator
    }
  }

  /** Append-mode session summaries; `events` must carry a watermark on
    * `ts` at least as large as the session gap. */
  def track(spark: SparkSession, events: Dataset[SessionEvent],
            gapMinutes: Int): Dataset[SessionRow] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMinutes * 60000L))
  }
}
