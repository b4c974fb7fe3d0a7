package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (user, event) row entering the stateful sessionizer. `event_ts`
  * carries `t + 1` as the watermark column ([[FpTimedRow]]'s shift: the
  * tag must flow INTO the stateful operator, and the +1 keeps a
  * legitimate t=0 above the engine's initial watermark of 0).
  */
case class SessEventRow(
    user_id: Long, t: Long, event_id: Long, value: Double,
    event_ts: java.sql.Timestamp)

/** Per-user sessionizer state: the NEXT session ordinal plus the open
  * session's running aggregate (`hasOpen=false` ⇔ nothing open — kept as
  * flat fields, not an Option, so the state rides the plain product
  * encoder). The residual per-user footprint after every session closes
  * is one int + flag (~30 B) — the price of batch-identical `session_seq`
  * ordinals across timeouts.
  */
case class SessState(
    nextSeq: Int, hasOpen: Boolean,
    start: Long, last: Long, n: Long, sum: Double)

/** One CLOSED session. */
case class SessionClosed(
    user_id: Long, session_seq: Int,
    session_start: Long, session_end: Long, n_events: Long, sum_value: Double)

/** Gap-based sessionization as a genuine stateful streaming OPERATOR —
  * `flatMapGroupsWithState` keyed by user — the streaming face of
  * [[graft.ops.Sessionize.byGap]] + `sessionStats` (which need the whole
  * history under a window; a stream cannot re-sort the past). A session
  * CLOSES, and its one summary row is emitted, when
  *   - a later event of the same user arrives more than `gapMs` of EVENT
  *     time after the session's last event (the gap rule), or
  *   - the watermark passes `last + gapMs` with no successor — an
  *     event-time TIMEOUT closes the idle session, so a user who walks
  *     away still yields their session without waiting for their return.
  *
  * Semantics match the batch op exactly on closed sessions: each user's
  * events fold in `(t, event_id)` order, `session_seq` is the 0-based
  * per-user ordinal (preserved ACROSS timeouts by keeping the counter in
  * state), bounds/count/value-sum fold in that pinned order —
  * deterministic under replay. Late events beyond the watermark may meet
  * an already-closed session and start a fresh ordinal — the standard
  * watermark contract; size the watermark delay (2·gap here) to the
  * source's disorder.
  *
  * 100-TB shape: state is ONE fixed-size row per ACTIVE user (the open
  * session's 5-field aggregate — never the event list), micro-batches
  * touch only the users they contain, and expiry is engine-driven
  * event-time timeout — RocksDB state-store territory at billions of
  * users, identical layout to Spark's own `sessionWindow`.
  *
  * State-retention knob: with `retainOrdinals = true` (default) a timed-
  * out user keeps a ~30 B tombstone (the ordinal counter) FOREVER, so
  * `session_seq` stays batch-identical across timeouts — but state then
  * grows with lifetime distinct users. `retainOrdinals = false` is the
  * TTL escape hatch: the tombstone is removed at timeout, bounding state
  * by the ACTIVE-user count, at the documented cost that a user's
  * ordinals restart at 0 after each idle expiry (per-session aggregates
  * are unaffected).
  *
  * Batch face: on a static frame state dies with the query, so the fold
  * also FLUSHES the trailing open session per user — the batch result is
  * then total and ≡ `Sessionize.byGap → sessionStats` row for row (the
  * spec pins this); in streaming mode the trailing session stays open in
  * state awaiting its gap or timeout.
  */
object StreamingSessionize {

  def sessions(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
      retainOrdinals: Boolean = true
  ): Dataset[SessionClosed] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    import spark.implicits._
    val streaming = events.isStreaming
    val selected = events.select(
      col(userCol).cast("long").as("user_id"),
      col(tsCol).cast("long").as("t"),
      col(idCol).cast("long").as("event_id"),
      coalesce(col(valueCol).cast("double"), lit(0.0)).as("value"),
      timestamp_millis(col(tsCol).cast("long") + lit(1L)).as("event_ts"))
    val marked =
      if (streaming) selected.withWatermark("event_ts", s"${2 * gapMs} milliseconds")
      else selected
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    marked.as[SessEventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionClosed](OutputMode.Append, timeout) {
        (user: Long, it: Iterator[SessEventRow], state: GroupState[SessState]) =>
          def closed(s: SessState) =
            SessionClosed(user, s.nextSeq - 1, s.start, s.last, s.n, s.sum)
          if (state.hasTimedOut) {
            // watermark passed last + gap: close the idle session. The
            // ordinal counter either stays as a ~30 B tombstone (ordinals
            // preserved across timeouts, state grows with lifetime users)
            // or is removed (state bounded by active users, ordinals
            // restart after expiry) — the caller's retention choice.
            val s = state.get
            if (retainOrdinals) state.update(s.copy(hasOpen = false))
            else state.remove()
            if (s.hasOpen) Iterator.single(closed(s)) else Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              SessState(0, hasOpen = false, 0L, 0L, 0L, 0.0))
            val out = Vector.newBuilder[SessionClosed]
            // fold in event-time order (ties by id) — batch-size invariant
            it.toVector.sortBy(r => (r.t, r.event_id)).foreach { r =>
              if (s.hasOpen && r.t - s.last > gapMs) {
                out += closed(s)
                s = s.copy(hasOpen = false)
              }
              s =
                if (s.hasOpen)
                  s.copy(last = math.max(s.last, r.t), n = s.n + 1, sum = s.sum + r.value)
                else SessState(s.nextSeq + 1, hasOpen = true, r.t, r.t, 1L, r.value)
            }
            if (streaming) {
              state.update(s)
              if (s.hasOpen) {
                // close via event-time timeout once the gap can no longer
                // be beaten (shifted event_ts domain, hence the +1); clamp
                // above the current watermark (past timeouts are rejected)
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(s.last + 1 + gapMs, wm + 1))
              }
            } else if (s.hasOpen) {
              // batch face: no later micro-batch can ever arrive — flush
              out += closed(s)
            }
            out.result().iterator
          }
      }
  }
}
