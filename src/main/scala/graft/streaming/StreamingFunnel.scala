package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Online view→purchase conversion detection (SURVEY §2 G13) — the
  * streaming counterpart of `TemporalOps.event_funnel` (A26).
  *
  * State per user is TWO LONGS (min view ts, max purchase ts) plus an
  * emitted bit — order-insensitive by construction: conversion is
  * `maxPurchase > minView`, a monotone predicate under new events, so a
  * view arriving AFTER the purchase it retro-converts (cross-batch
  * out-of-order) still flips the user exactly once, with no ordering
  * assumption inside or across micro-batches. This is the same
  * min/max formulation the batch funnel aggregates, which is why parity
  * holds on any arrival order — both sides compute extremes, never
  * sequences. Emission is append-mode: one Conversion row per user,
  * in the micro-batch where the predicate first becomes true.
  *
  * State is O(distinct users) × ~17 bytes and never grows with event
  * volume; converted users keep only the emitted bit (their extremes
  * stop mattering). For bounded-retention deployments wrap the call
  * with a watermark + timeout policy at the call site.
  */
object StreamingFunnel {
  case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(minViewUs: Long, maxPurchaseUs: Long, emitted: Boolean)
  case class Conversion(user_id: Long, first_view: Timestamp, converted_at: Timestamp)

  private val NoneUs = Long.MinValue

  // exact micro conversion: getTime is millis-only; the micro fraction
  // lives in getNanos, and the batch funnel compares full-precision
  // timestamps, so parity requires carrying it
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def conversions(events: Dataset[Ev]): Dataset[Conversion] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Conversion]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelState]) => {
          val prev = state.getOption.getOrElse(FunnelState(NoneUs, NoneUs, emitted = false))
          var minView = if (prev.minViewUs == NoneUs) Long.MaxValue else prev.minViewUs
          var maxPurchase = prev.maxPurchaseUs
          evs.foreach { e =>
            val us = toUs(e.ts)
            e.event_type match {
              case "view"     => if (us < minView) minView = us
              case "purchase" => if (us > maxPurchase) maxPurchase = us
              case _          =>
            }
          }
          val converted = minView != Long.MaxValue && maxPurchase != NoneUs &&
            maxPurchase > minView
          if (converted && !prev.emitted) {
            state.update(FunnelState(minView, maxPurchase, emitted = true))
            Iterator.single(Conversion(userId,
              fromUs(minView), fromUs(maxPurchase)))
          } else {
            state.update(FunnelState(
              if (minView == Long.MaxValue) NoneUs else minView,
              maxPurchase, prev.emitted))
            Iterator.empty
          }
        })
  }
}
