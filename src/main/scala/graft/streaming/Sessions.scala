package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the continuous form of the batch
  * `Queries.qSessionize` (lag + cumulative-sum over a window), re-expressed
  * as `flatMapGroupsWithState` with an event-time timeout.
  *
  * A user's open session lives in state; events within `gapMs` of the
  * session's last event extend it, a larger gap closes it (emitted
  * immediately) and opens a new one, and the event-time timeout closes an
  * open session once the watermark passes `last + gapMs` — the streaming
  * guarantee that a session is emitted exactly once, when no event can
  * extend it anymore.
  *
  * State per key is O(1) (one open session), so the operator scales with
  * the number of CONCURRENTLY ACTIVE users, not with history — the property
  * that matters when the event stream is unbounded. For fixed-gap
  * sessionization Spark's built-in `session_window` is preferred (see the
  * spec); this operator is the template for session semantics the built-in
  * cannot express (per-key gaps, session caps, custom merge logic).
  */
object Sessions {

  case class Event(userId: String, ts: java.sql.Timestamp, eventId: Long)

  case class OpenSession(start: Long, last: Long, n: Long)

  case class ClosedSession(
      userId: String, sessionStart: Long, durationMs: Long, nEvents: Long)

  /** Transition function — pure, unit-testable via TestGroupState. */
  def update(gapMs: Long)(
      userId: String,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(userId, s.start, s.last - s.start, s.n))
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
      val closed = Seq.newBuilder[ClosedSession]
      var open = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.last <= gapMs =>
            open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
          case Some(s) =>
            closed += ClosedSession(userId, s.start, s.last - s.start, s.n)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // timeout once no event can extend the session; clamp above the
        // current watermark (Spark rejects timestamps at or below it)
        state.setTimeoutTimestamp(
          math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.result().iterator
    }
  }

  /** Wire the operator over an event stream. `events` must carry the
    * watermark (apply `.withWatermark("ts", ...)` upstream). */
  def track(
      spark: SparkSession,
      events: Dataset[Event],
      gapMs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }
}
