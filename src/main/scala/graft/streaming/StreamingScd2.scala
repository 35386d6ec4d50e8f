package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import scala.collection.mutable.ListBuffer

/** G37 streaming twin: online SCD Type-2 maintenance. A change stream
  * folds into version intervals with the SAME semantics as the batch
  * [[graft.operators.Scd2.build]] — (ts, tie) total order, no-op
  * collapse, half-open intervals — but incrementally, emitting each
  * version the moment it CLOSES.
  *
  * Correct out-of-order handling is the whole point: a version's
  * position in the history depends on every change with a smaller
  * timestamp, so changes BUFFER in state until the watermark passes
  * their event time (only then can no earlier-stamped change still
  * arrive). Ripe changes fold through the collapse state machine in
  * (ts, tie) order, closed intervals emit (append mode — a closed
  * version is an immutable fact), and the open version stays in state
  * as the key's current truth.
  *
  * State bound, stated: O(changes inside the watermark horizon) per
  * key while the key is active, decaying to ONE open version per
  * live key — the honest floor for a dimension (a key's current state
  * must outlive any window). Late-beyond-watermark changes are dropped
  * by the watermark itself (Spark's contract); pick the delay from the
  * source's real disorder bound.
  *
  * The open (current) version never emits downstream — append mode
  * cannot retract it when it later closes. Current-state serving is
  * the store's job: closed versions land wherever the caller sinks
  * them, and `Scd2.asOf`-style reads compose closed rows with the
  * live dimension snapshot.
  */
object StreamingScd2 {

  case class Change(key: Long, attr: Option[String], ts: Timestamp, tie: Long)
  case class Pending(ts: Long, tie: Long, attr: Option[String])
  case class Scd2KeyState(open: Option[Pending], buf: Seq[Pending])
  case class ClosedVersion(key: Long, attr: Option[String],
      valid_from: Timestamp, valid_to: Timestamp)

  /** Closed-version stream. `delay` is the watermark (disorder bound),
    * e.g. "10 minutes". */
  def versions(changes: Dataset[Change], delay: String): Dataset[ClosedVersion] = {
    implicit val outEnc = Encoders.product[ClosedVersion]
    implicit val stateEnc = Encoders.product[Scd2KeyState]
    implicit val keyEnc = Encoders.scalaLong

    def fold(key: Long, st: Scd2KeyState, wmMs: Long,
             out: ListBuffer[ClosedVersion]): Scd2KeyState = {
      val (ripe, rest) = st.buf.partition(_.ts < wmMs)
      var open = st.open
      // the batch build's (ts, tie) total order
      ripe.sortBy(p => (p.ts, p.tie)).foreach { p =>
        open match {
          case Some(o) if o.attr != p.attr =>
            out += ClosedVersion(key, o.attr,
              new Timestamp(o.ts), new Timestamp(p.ts))
            open = Some(p)
          case Some(_) => () // no-op re-observation: version stays open
          case None => open = Some(p)
        }
      }
      Scd2KeyState(open, rest)
    }

    def fn(key: Long, batch: Iterator[Change],
           state: GroupState[Scd2KeyState]): Iterator[ClosedVersion] = {
      val out = ListBuffer.empty[ClosedVersion]
      val wm = state.getCurrentWatermarkMs()
      val prev = state.getOption.getOrElse(Scd2KeyState(None, Nil))
      val withBatch =
        if (state.hasTimedOut) prev
        else prev.copy(buf = prev.buf ++
          batch.map(c => Pending(c.ts.getTime, c.tie, c.attr)))
      val next = fold(key, withBatch, wm, out)
      state.update(next)
      if (next.buf.nonEmpty) {
        // fire once the watermark passes the earliest buffered change
        // (+1 so "passes" is strict, matching ripe = ts < wm)
        state.setTimeoutTimestamp(math.max(next.buf.map(_.ts).min + 1, wm + 1))
      }
      out.iterator
    }

    changes
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
