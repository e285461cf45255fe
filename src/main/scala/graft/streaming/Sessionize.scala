package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState —
  * custom per-key state that windowed aggregation can't express
  * (sessions have data-driven, unaligned boundaries).
  *
  * State per user: open session (start, last-seen, count). An event
  * extends the session if it lands within `gapSeconds` of the last
  * one, else the open session is EMITTED and a new one starts. Event-
  * time timeout (watermark-driven) closes idle sessions, which bounds
  * state size — the property that matters at 100 TB: state is
  * O(active users), not O(events).
  */
object Sessionize {

  case class Event(userId: Long, ts: Timestamp)
  case class SessionState(start: Long, lastMs: Long, n: Long)
  case class Session(userId: Long, sessionStart: Timestamp,
                     sessionEnd: Timestamp, nEvents: Long)

  def sessions(spark: SparkSession, events: Dataset[Event],
               gapSeconds: Long = 1800,
               watermark: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastMs), s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closedSessions = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // min-guard the start too: a late-but-within-
                  // watermark event may precede the open session
                  open = Some(s.copy(start = math.min(s.start, t),
                    lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closedSessions += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastMs), s.n)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closedSessions.result().iterator
          }
      }
  }
}
