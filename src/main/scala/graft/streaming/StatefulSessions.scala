package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state form the builtin `session_window` can't express
  * when a session needs imperative per-group bookkeeping (event counts
  * folded incrementally, explicit close-on-timeout emission, state the
  * size of ONE open session per key regardless of stream length).
  *
  * Semantics: gap-based sessions per user. Events within `gapMs` of the
  * session's last event extend it; a larger gap closes it (emitted
  * immediately, append mode); the watermark passing `last + gap` fires an
  * event-time timeout that closes the trailing open session. State per
  * key is a single `OpenSession` (three longs) and is removed on close —
  * bounded by the number of concurrently-active users, not by history,
  * which is what lets this run forever on an unbounded stream.
  *
  * Mirrors the reference's stop-time handling shape (close-on-quiet,
  * `src/Stream/Partition.cpp` stop logic) generalized to per-key sessions.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts_ms: Long)

  case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)

  case class ClosedSession(
      user_id: Long,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long)

  /** Closed sessions for a (possibly streaming) dataset of events.
    * Streaming input must carry event-time `ts_ms`; the watermark is
    * applied here over a derived timestamp column. In batch mode the same
    * fold runs once per key and trailing sessions close at end-of-input
    * (batch has no timeouts — end-of-data IS the watermark at +∞).
    */
  def sessions(
      events: Dataset[SessionEvent],
      gapMs: Long,
      watermarkDelay: String = "0 seconds"
  ): Dataset[ClosedSession] = {
    implicit val keyEnc: Encoder[Long]            = Encoders.scalaLong
    implicit val stateEnc: Encoder[OpenSession]   = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[ClosedSession]   = Encoders.product[ClosedSession]
    implicit val evEnc: Encoder[SessionEvent]     = Encoders.product[SessionEvent]

    val spark = events.sparkSession
    import org.apache.spark.sql.functions.{col, timestamp_millis}

    val streaming = events.isStreaming
    // the watermarked column must stay in the plan below the stateful
    // operator (the unsupported-operation checker resolves the event-time
    // column from the child's output); `.as[SessionEvent]` deserializes by
    // name so the extra column rides along harmlessly
    val marked =
      if (streaming)
        events
          .withColumn("event_time", timestamp_millis(col("ts_ms")))
          .withWatermark("event_time", watermarkDelay)
          .as[SessionEvent]
      else events

    def close(user: Long, s: OpenSession): ClosedSession =
      ClosedSession(user, s.start_ms, s.last_ms, s.n_events)

    def fold(
        user: Long,
        it: Iterator[SessionEvent],
        state: GroupState[OpenSession]
    ): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(close(user, s))
      } else {
        // Fold the batch's events AND the open session with one
        // gaps-and-islands sweep over start-ordered intervals. This is
        // what makes cross-batch out-of-order events (still inside the
        // watermark) match the batch fold: an event in
        // (start − gap, start) extends the open session DOWNWARD
        // (start_ms lowered), a chain of old events can bridge into it,
        // and events older than any bridge form their own earlier
        // sessions, closed immediately.
        val evs = it.map(_.ts_ms).toArray.sorted.map(t => OpenSession(t, t, 1L))
        val items: Array[OpenSession] = state.getOption match {
          case Some(o) =>
            val idx = evs.indexWhere(_.start_ms > o.start_ms) match {
              case -1 => evs.length
              case i  => i
            }
            (evs.take(idx) :+ o) ++ evs.drop(idx)
          case None => evs
        }
        var merged = List.empty[OpenSession]
        items.foreach { iv =>
          merged match {
            case h :: t if iv.start_ms - h.last_ms <= gapMs =>
              merged = OpenSession(h.start_ms, math.max(h.last_ms, iv.last_ms),
                h.n_events + iv.n_events) :: t
            case _ => merged = iv :: merged
          }
        }
        val sessions = merged.reverse // ascending by start
        var closed   = sessions.dropRight(1).map(close(user, _))
        sessions.lastOption match {
          case Some(o) if streaming =>
            val closeAt = o.last_ms + gapMs
            if (state.getCurrentWatermarkMs() >= closeAt) {
              // watermark already past the close point (late burst):
              // a timeout this old would be rejected — close inline
              closed = closed :+ close(user, o)
              if (state.exists) state.remove()
            } else {
              state.update(o)
              state.setTimeoutTimestamp(closeAt)
            }
          case Some(o) =>
            // batch mode: end-of-input closes the trailing session
            closed = closed :+ close(user, o)
            if (state.exists) state.remove()
          case None => ()
        }
        closed.iterator
      }
    }

    marked
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
