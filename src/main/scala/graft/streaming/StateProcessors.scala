package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** Per-key running CDC state: tracks the latest (lsn, value); emits
    * on change; tombstone clears state and emits value = NaN marker.
    * Out-of-order rows below the stored lsn are ignored
    * (last-write-wins, same semantics as the batch Cdc.compact). */
  class RunningCdcState
      extends StatefulProcessor[Long, CdcStream.Change, (Long, Long, Double)] {

    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "latest", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[CdcStream.Change],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val sorted = rows.toSeq.sortBy(_.lsn)
      val priorLsn = Option(state.get()).map(_._1).getOrElse(-1L)
      sorted.lastOption match {
        case Some(c) if c.lsn > priorLsn =>
          if (c.op == "d") {
            state.clear()
            Iterator((key, c.lsn, Double.NaN))
          } else {
            state.update((c.lsn, c.value))
            Iterator((key, c.lsn, c.value))
          }
        case _ => Iterator.empty
      }
    }
  }
}
