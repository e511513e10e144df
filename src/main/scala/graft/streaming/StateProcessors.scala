package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4.x transformWithState processors (§2-J stateful per-key
  * processing). Requires the RocksDB state store provider
  * (rocksdbjni ships in /opt/spark/jars) — the provider that scales
  * state beyond executor heap and supports changelog checkpointing.
  */
object StateProcessors {

  /** Per-key event counter whose state expires after a processing-time
    * TTL — the bounded-state pattern for keys that go quiet (state
    * store stays O(active keys), not O(ever-seen keys)). */
  class TtlCounter(ttlMs: Long)
      extends StatefulProcessor[Long, CdcStream.Change, (Long, Long)] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    override def handleInputRows(key: Long, rows: Iterator[CdcStream.Change],
                                 timerValues: TimerValues): Iterator[(Long, Long)] = {
      val cur = Option(n.get()).getOrElse(0L) + rows.size
      n.update(cur)
      Iterator((key, cur))
    }
  }

  /** Streaming transaction buffer on the transformWithState API — the
    * 4.x-native twin of [[CdcStream.transactionalBuffer]] with
    * IDENTICAL semantics (release at commit marker, size-cap overflow
    * flush with observable counter, post-commit redelivery tombstone,
    * abandoned-overflow corruption counter at timeout — see that
    * scaladoc for the full contract and why each rule exists). What
    * changes is the state machinery, and each change is the reason to
    * migrate:
    *  - the event buffer is a [[ListState]] — the state store appends
    *    incoming events instead of deserializing + reserializing the
    *    WHOLE buffer per batch the way fMGWS's single state blob
    *    forces (for a near-cap tx that rewrite is the per-batch
    *    bill);
    *  - flags (overflowed/committed/armed timer) live in a separate
    *    tiny [[ValueState]], so the hot redelivery-tombstone path
    *    never touches the list at all;
    *  - expiry is an explicit registered TIMER (`handleExpiredTimer`)
    *    rather than a per-batch `setTimeoutDuration` re-arm.
    * Timeout ≤ 0 disables expiry (TimeMode.None — deterministic
    * tests quiesce, same rule as the fMGWS path). */
  class TxBuffer(abandonedTimeoutMs: Long, maxBufferedEvents: Int,
                 overflowCounter: Option[org.apache.spark.util.LongAccumulator],
                 abandonedOverflowCounter: Option[org.apache.spark.util.LongAccumulator])
      extends StatefulProcessor[String, CdcStream.TxEvent, CdcStream.TxEvent] {

    @transient private var buf: ListState[CdcStream.TxEvent] = _
    // (overflowed, committed, armedTimerMs) — armedTimerMs -1 = none
    @transient private var flags: ValueState[(Boolean, Boolean, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[CdcStream.TxEvent]("buf",
        Encoders.product[CdcStream.TxEvent], TTLConfig.NONE)
      flags = getHandle.getValueState[(Boolean, Boolean, Long)]("flags",
        Encoders.product[(Boolean, Boolean, Long)], TTLConfig.NONE)
    }

    /** One live timer per tx: drop the stale one, arm now+timeout. */
    private def rearm(tv: TimerValues, prior: Long): Long =
      if (abandonedTimeoutMs <= 0) -1L
      else {
        if (prior >= 0) getHandle.deleteTimer(prior)
        val at = tv.getCurrentProcessingTimeInMs() + abandonedTimeoutMs
        getHandle.registerTimer(at)
        at
      }

    override def handleInputRows(tx: String,
                                 rows: Iterator[CdcStream.TxEvent],
                                 tv: TimerValues): Iterator[CdcStream.TxEvent] = {
      val (overflowed, committed, armed) =
        Option(flags.get()).getOrElse((false, false, -1L))
      val incoming = rows.toList
      if (committed) {
        // redelivered after the commit marker: drop, keep tombstone
        flags.update((false, true, rearm(tv, armed)))
        Iterator.empty
      } else {
        val buffered = if (buf.exists()) buf.get().toList else Nil
        val all = buffered ++ incoming
        val (markers, pending) = all.partition(_.op == "t")
        if (markers.nonEmpty) {
          buf.clear()
          flags.update((false, true, rearm(tv, armed)))
          pending.sortBy(_.lsn).iterator
        } else if (overflowed) {
          // cap already tripped: stream through (buffer stays empty)
          flags.update((true, false, rearm(tv, armed)))
          pending.sortBy(_.lsn).iterator
        } else if (pending.length > maxBufferedEvents) {
          overflowCounter.foreach(_.add(1))
          buf.clear()
          flags.update((true, false, rearm(tv, armed)))
          pending.sortBy(_.lsn).iterator
        } else {
          // append-only state write: only the NEW events hit the store
          if (incoming.nonEmpty) buf.appendList(incoming.toArray)
          flags.update((false, false, rearm(tv, armed)))
          Iterator.empty
        }
      }
    }

    override def handleExpiredTimer(tx: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CdcStream.TxEvent] = {
      val (overflowed, committed, _) =
        Option(flags.get()).getOrElse((false, false, -1L))
      if (overflowed && !committed)
        abandonedOverflowCounter.foreach(_.add(1))
      buf.clear()
      flags.clear()
      Iterator.empty
    }
  }

  /** Input/output rows for the EVENT-TIME sessionizer. `tsMs` = epoch
    * millis of the event (the caller's watermark column, pre-cast). */
  final case class SessEvent(user: Long, tsMs: Long, v: Double)
  final case class SessionOut(user: Long, startMs: Long, endMs: Long,
                              n: Long, sum: Double, closed_by: String)

  /** Session-gap processor on EVENT-TIME timers — the sessionizer the
    * built-in `session_window` cannot be: besides the gap timeout it
    * SPLITS a session at `maxEvents` (the bot-storm/runaway-device
    * guard — one key emitting forever would otherwise grow one
    * session row unboundedly in both state and semantics), and each
    * closed session says WHY it closed (`gap` in-batch, `cap` split,
    * `timer` watermark expiry) — the audit column windowed aggs
    * cannot carry.
    *
    * Mechanics (the third and last TWS mode this repo exercises,
    * after processing-time TTL and processing-time timers): rows
    * fold in event-time order; a gap or cap closure emits
    * immediately; the OPEN tail registers an event-time timer at
    * lastTs + gap, so the watermark closes idle sessions exactly the
    * way session_window's state TTL does — state per key is one
    * fixed-size tuple, bounded by the watermark like every stateful
    * op here. Late rows BELOW an already-closed session's end simply
    * open/extend a new session (the watermark already bounded how
    * late they can be; a windowed agg would have dropped them the
    * same way). */
  class SessionGap(gapMs: Long, maxEvents: Int)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {

    @transient private var st: ValueState[(Long, Long, Long, Double, Long)] = _
    // (startMs, lastMs, n, sum, armedTimerMs)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Double, Long)](
        "sess", Encoders.product[(Long, Long, Long, Double, Long)],
        TTLConfig.NONE)

    private def rearm(prior: Long, lastMs: Long): Long = {
      if (prior >= 0) getHandle.deleteTimer(prior)
      val at = lastMs + gapMs
      getHandle.registerTimer(at)
      at
    }

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.tsMs)
      val out = Seq.newBuilder[SessionOut]
      var (start, last, n, sum, armed) =
        Option(st.get()).getOrElse((-1L, -1L, 0L, 0.0, -1L))
      sorted.foreach { e =>
        if (start < 0) { start = e.tsMs; last = e.tsMs; n = 1; sum = e.v }
        else if (e.tsMs - last > gapMs) {
          out += SessionOut(user, start, last, n, sum, "gap")
          start = e.tsMs; last = e.tsMs; n = 1; sum = e.v
        } else if (n + 1 > maxEvents) {
          out += SessionOut(user, start, last, n, sum, "cap")
          start = e.tsMs; last = e.tsMs; n = 1; sum = e.v
        } else { last = math.max(last, e.tsMs); n += 1; sum += e.v }
      }
      if (start >= 0) {
        st.update((start, last, n, sum, rearm(armed, last)))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      Option(st.get()) match {
        case Some((start, last, n, sum, armed))
            // only the CURRENT session's timer closes it — a stale
            // timer from a session that was already gap/cap-closed
            // (and whose successor re-armed) must not fire twice
            if info.getExpiryTimeInMs() >= armed =>
          st.clear()
          Iterator(SessionOut(user, start, last, n, sum, "timer"))
        case _ => Iterator.empty
      }
    }
  }

  /** Per-key running CDC state: tracks the latest (lsn, value); emits
    * on change; tombstone clears state and emits value = None —
    * the EXACT [[CdcStream.StateOut]] contract of the fMGWS
    * [[CdcStream.runningState]] (r15: was a NaN marker, which
    * conflated a genuine NaN payload with a delete). Out-of-order
    * rows below the stored lsn are ignored (last-write-wins, same
    * semantics as the batch Cdc.compact). */
  class RunningCdcState
      extends StatefulProcessor[Long, CdcStream.Change, CdcStream.StateOut] {

    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "latest", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[CdcStream.Change],
        timerValues: TimerValues): Iterator[CdcStream.StateOut] = {
      val sorted = rows.toSeq.sortBy(_.lsn)
      val priorLsn = Option(state.get()).map(_._1).getOrElse(-1L)
      sorted.lastOption match {
        case Some(c) if c.lsn > priorLsn =>
          if (c.op == "d") {
            state.clear()
            Iterator(CdcStream.StateOut(key, c.lsn, None))
          } else {
            state.update((c.lsn, c.value))
            Iterator(CdcStream.StateOut(key, c.lsn, Some(c.value)))
          }
        case _ => Iterator.empty
      }
    }
  }
}
