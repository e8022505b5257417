package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state form the builtin `session_window` can't express
  * when a session needs imperative per-group bookkeeping (event counts
  * folded incrementally, explicit close-on-timeout emission, bounded
  * explicit state per key).
  *
  * Semantics: gap-based sessions per user, emitted EXACTLY as the batch
  * gaps-and-islands fold would for all data within the watermark: a
  * session (island) closes only once the watermark passes `last + gap` —
  * never earlier, because a within-watermark out-of-order event may still
  * extend it, lower its start, or bridge two islands (append-mode output
  * is unretractable, so early emission would fabricate overlapping
  * sessions the batch fold merges). State per key is the list of islands
  * whose close point the watermark has not yet passed — bounded by the
  * watermark horizon over the gap, NOT by history — and is removed when
  * the last island closes, which is what lets this run forever on an
  * unbounded stream.
  *
  * Mirrors the reference's stop-time handling shape (close-on-quiet,
  * `src/Stream/Partition.cpp` stop logic) generalized to per-key sessions.
  */
object StatefulSessions {

  /** Session confs for running stateful queries on the RocksDB state
    * store — at production key cardinality the default provider keeps
    * every key's ledger on the executor heap; RocksDB moves state
    * off-heap with changelog checkpointing so a 100 TB-scale key space
    * neither pressures the heap nor re-uploads full snapshots per batch.
    * Apply BEFORE starting the query:
    * `StatefulSessions.RocksDbStateStore.foreach((spark.conf.set _).tupled)`.
    * (A session-wide conf, not per-query — which is why it ships as data
    * rather than being hard-set inside [[sessions]].)
    */
  val RocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  case class SessionEvent(user_id: Long, ts_ms: Long)

  case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)

  /** Per-key state: start-ordered disjoint islands still inside the
    * watermark horizon.
    */
  case class SessionLedger(islands: Seq[OpenSession])

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
    implicit val stateEnc: Encoder[SessionLedger] = Encoders.product[SessionLedger]
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

    /** Emit the islands the watermark has passed; keep (and re-arm the
      * timeout for) the rest. An island closes ONLY here — emitting any
      * earlier would race within-watermark out-of-order events that can
      * still merge into it (append output is unretractable).
      */
    def settle(
        user: Long,
        islands: Seq[OpenSession],
        state: GroupState[SessionLedger]
    ): Iterator[ClosedSession] = {
      val wm = state.getCurrentWatermarkMs()
      val (done, open) = islands.partition(_.last_ms + gapMs <= wm)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(SessionLedger(open))
        // earliest close point; all open islands have closeAt > wm, so
        // the timestamp is valid for EventTimeTimeout
        state.setTimeoutTimestamp(open.map(_.last_ms + gapMs).min)
      }
      done.map(close(user, _)).iterator
    }

    def fold(
        user: Long,
        it: Iterator[SessionEvent],
        state: GroupState[SessionLedger]
    ): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        settle(user, state.get.islands, state)
      } else {
        // Fold the batch's events AND every held island with one
        // gaps-and-islands sweep over start-ordered intervals. This is
        // what makes cross-batch out-of-order events (still inside the
        // watermark) match the batch fold: an event can extend an island
        // DOWNWARD (start lowered), bridge two islands into one, or open
        // its own island between them.
        //
        // Hot-path shape: timestamps sort as a primitive array (no
        // per-event OpenSession boxing), and because the held ledger is
        // ALREADY start-ordered (settle stores the ascending merge
        // output), islands and events combine with one linear two-pointer
        // merge instead of re-sorting the union every batch.
        val ts = it.map(_.ts_ms).toArray
        java.util.Arrays.sort(ts)
        val prior =
          state.getOption.map(_.islands.toArray).getOrElse(Array.empty[OpenSession])
        val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
        def push(start: Long, last: Long, n: Long): Unit = {
          val k = out.length - 1
          if (k >= 0 && start - out(k).last_ms <= gapMs) {
            val h = out(k)
            out(k) = OpenSession(h.start_ms, math.max(h.last_ms, last), h.n_events + n)
          } else out += OpenSession(start, last, n)
        }
        var i = 0
        var j = 0
        while (i < prior.length || j < ts.length) {
          if (j >= ts.length ||
            (i < prior.length && prior(i).start_ms <= ts(j))) {
            val p = prior(i); push(p.start_ms, p.last_ms, p.n_events); i += 1
          } else { push(ts(j), ts(j), 1L); j += 1 }
        }
        val sessions = out.toSeq // ascending by start
        if (streaming) settle(user, sessions, state)
        else {
          // batch mode: end-of-input IS the watermark at +∞ — close all
          if (state.exists) state.remove()
          sessions.map(close(user, _)).iterator
        }
      }
    }

    marked
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
