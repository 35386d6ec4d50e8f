package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import scala.collection.mutable.ListBuffer

/** Custom-state online sessionization (`flatMapGroupsWithState`) — the
  * stateful-streaming counterpart of the batch `feat_sessionize` query
  * for state machines `session_window` can't express (here: the same gap
  * semantics, but with explicit control over emission and timeout).
  *
  * State per entity = the open session; closed sessions emit immediately
  * when a gap is observed in-batch, and the final open session emits via
  * event-time timeout once the watermark passes its gap horizon — so
  * state is bounded and no session is held forever.
  */
object StreamingSessionizer {
  case class SessEvent(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  def sessionize(events: Dataset[SessEvent], gapMinutes: Int): Dataset[ClosedSession] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    def close(uid: Long, s: OpenSession) = ClosedSession(uid,
      new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)

    def fn(uid: Long, batch: Iterator[SessEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val out = ListBuffer.empty[ClosedSession]
      if (state.hasTimedOut) {
        state.getOption.foreach(s => out += close(uid, s))
        state.remove()
      } else {
        var cur = state.getOption
        batch.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end > gapMs =>
              out += close(uid, s)
              cur = Some(OpenSession(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
            case None =>
              cur = Some(OpenSession(t, t, 1, e.value))
          }
        }
        cur match {
          case Some(s) =>
            state.update(s)
            state.setTimeoutTimestamp(s.end + gapMs)
          case None => ()
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
