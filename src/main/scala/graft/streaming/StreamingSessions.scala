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
  /** State = ALL of the user's not-yet-final sessions, gap-closed ones
    * included — a gap-closed session stays in state until the
    * watermark passes its deadline, so a late event that lands between
    * two sessions (still inside the watermark) re-merges correctly
    * instead of corrupting the newer session. Emission happens only on
    * event-time timeout: output is final. */
  final case class SessionState(sessions: List[OpenSession])
  final case class SessionRow(user: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, events: Long,
                              span_seconds: Long, value_sum: Double)

  def update(gapMs: Long)(user: Long, events: Iterator[SessionEvent],
             state: GroupState[SessionState]): Iterator[SessionRow] = {
    def row(s: OpenSession): SessionRow =
      SessionRow(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
        s.events, (s.last - s.start) / 1000L, s.value)
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val incoming = events
      .map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1, e.value)).toList
    // interval-coalesce: sort every candidate (old sessions + new
    // single-event sessions) by start and merge neighbours within the
    // gap — late events extend, bridge, or prepend sessions exactly as
    // a batch re-sessionization of the union would
    val merged = (existing ++ incoming).sortBy(s => (s.start, s.last)) match {
      case Nil => Nil
      case h :: t =>
        t.foldLeft(List(h)) { (acc, s) =>
          val cur = acc.head
          if (s.start - cur.last <= gapMs)
            OpenSession(cur.start, math.max(cur.last, s.last),
              cur.events + s.events, cur.value + s.value) :: acc.tail
          else s :: acc
        }.reverse
    }
    // a session is final only once the watermark passes last + gap —
    // nothing inside the watermark can change it anymore
    val wm = state.getCurrentWatermarkMs()
    val (fin, pending) = merged.partition(s => s.last + gapMs <= wm)
    if (pending.isEmpty) state.remove()
    else {
      state.update(SessionState(pending))
      state.setTimeoutTimestamp(pending.map(_.last + gapMs).min)
    }
    fin.map(row).iterator
  }

  /** Append-mode session summaries; `events` must carry a watermark on
    * `ts` at least as large as the session gap. */
  def track(spark: SparkSession, events: Dataset[SessionEvent],
            gapMinutes: Int): Dataset[SessionRow] = {
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMinutes * 60000L))
  }
}
