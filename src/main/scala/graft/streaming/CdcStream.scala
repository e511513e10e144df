package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

import graft.ops.cdc.Cdc

/** Streaming CDC pipeline (§2-J): file-based change-log source →
  * stateful current-state view / foreachBatch upsert sink.
  *
  * Transport is a JSONL envelope directory (no Kafka jar ships in
  * /opt/spark/jars — the file source is the offset-tracked,
  * replayable stand-in; the reference category's connector transport
  * differs only in setup, per BASELINE.json). Exactly-once: offsets
  * commit to the checkpoint WAL before processing; the upsert sink is
  * idempotent (last-write-wins by lsn), so replays converge.
  */
object CdcStream {

  /** Streaming change-log source over a JSONL envelope directory.
    * maxFilesPerTrigger bounds per-batch work (and makes tests
    * deterministic). */
  def source(spark: SparkSession, dir: String, payload: StructType,
             maxFilesPerTrigger: Int = 1): DataFrame = {
    val raw = spark.readStream
      .schema(Cdc.envelopeSchema(payload))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
    raw.select(col("op"), col("before"), col("after"),
      col("source.table").as("src_table"), col("source.lsn").as("lsn"),
      col("ts_ms"))
  }

  /** foreachBatch upsert sink — a thin delegation to
    * [[partitionedUpsertSink]] (same signature shape as the original
    * whole-table sink, same read path via `PartitionedUpsert.read`).
    *
    * The first-generation implementation read and rewrote the ENTIRE
    * state table every micro-batch (O(table) per trigger — at 100 TB
    * the sink can never keep up) and committed via two successive
    * overwrites, so a crash mid-second-overwrite left the target
    * half-written with no manifest to fall back to. The bucket-
    * partitioned target kills both: each batch rewrites only touched
    * buckets, and the atomic manifest publish means a crash at ANY
    * point leaves the previous committed state fully readable. */
  def upsertSink(changes: DataFrame, targetDir: String, checkpointDir: String,
                 keys: Seq[String], valueCols: Seq[String],
                 nBuckets: Int = 16): StreamingQuery = {
    require(keys.length == 1,
      "upsertSink buckets the target by a single key column; pass a " +
        "composite key pre-combined into one column (e.g. a struct or " +
        "concat_ws fingerprint)")
    partitionedUpsertSink(changes, targetDir, checkpointDir, keys.head,
      "lsn", "op", valueCols, nBuckets)
  }

  /** Streaming → PartitionedUpsert: the production-shape CDC sink.
    * Each micro-batch merges into the bucket-partitioned, manifest-
    * committed target (O(touched buckets) per batch; readers see
    * atomic snapshots — see ops.cdc.PartitionedUpsert).
    *
    * Exactly-once is idempotence + state: offsets commit to the
    * checkpoint WAL, the merge is last-write-wins by lsn (replaying a
    * batch converges), and `dropDuplicates(lsnCol)` suppresses
    * REDELIVERED events whose lsn was already applied — without it a
    * stale replay (old lsn, old value) would clobber newer state,
    * because the materialized target keeps no per-key lsn to compare
    * against. That dedup state lives in the state store: run with the
    * RocksDB provider + changelog checkpointing so it scales past
    * executor heap and survives restart (asserted by the
    * kill-and-resume run in graft.StreamSmoke). At 100 TB/day swap the
    * unbounded dedup for dropDuplicatesWithinWatermark to bound state
    * by the redelivery horizon. */
  def partitionedUpsertSink(changes: DataFrame, targetDir: String,
                            checkpointDir: String, keyCol: String,
                            lsnCol: String, opCol: String,
                            valueCols: Seq[String], nBuckets: Int): StreamingQuery = {
    import graft.ops.cdc.PartitionedUpsert
    val spark = changes.sparkSession
    changes.dropDuplicates(lsnCol)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (PartitionedUpsert.currentManifest(spark, targetDir).isEmpty) {
          val empty = batch.select((keyCol +: valueCols).map(col): _*).limit(0)
          // a racing query may initialize between the check and here;
          // losing that race is fine — the table exists either way
          try PartitionedUpsert.init(empty, targetDir, keyCol, nBuckets)
          catch {
            case _: IllegalStateException |
                 _: java.util.ConcurrentModificationException => ()
          }
        }
        PartitionedUpsert.merge(spark, targetDir, batch, keyCol, lsnCol,
          opCol, valueCols, nBuckets): Unit
      }
      .start()
  }

  /** Streaming transaction buffer — the streaming twin of
    * Cdc.applyTransactional: events of a transaction are held in
    * per-tx state and released ONLY when the commit marker (op='t')
    * arrives, so downstream (e.g. the upsert sink) never applies half
    * a transaction. Abandoned transactions (marker never arrives —
    * source crash mid-tx) time out and are dropped, bounding state.
    * Input must be transactional events; route NULL-tx events around
    * the buffer (they are their own transaction). */
  case class TxEvent(tx: String, lsn: Long, pk: Long, op: String, value: Double)

  def transactionalBuffer(events: Dataset[TxEvent],
                          abandonedTimeoutMs: Long = 3600000L): Dataset[TxEvent] = {
    import events.sparkSession.implicits._
    // timeout <= 0 disables expiry: a ProcessingTime-timeout query never
    // quiesces (the engine keeps scheduling cleanup batches), so
    // deterministic tests need the NoTimeout mode
    val timeoutMode =
      if (abandonedTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.tx)
      .flatMapGroupsWithState[List[TxEvent], TxEvent](
        OutputMode.Append(), timeoutMode) {
        (_: String, rows: Iterator[TxEvent], state: GroupState[List[TxEvent]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty // abandoned: marker never arrived
          } else {
            val buf = state.getOption.getOrElse(Nil) ++ rows
            if (buf.exists(_.op == "t")) {
              state.remove()
              buf.filterNot(_.op == "t").sortBy(_.lsn).iterator
            } else {
              state.update(buf)
              if (abandonedTimeoutMs > 0) state.setTimeoutDuration(abandonedTimeoutMs)
              Iterator.empty
            }
          }
      }
  }

  /** Stateful running current-state view via flatMapGroupsWithState:
    * emits (pk, value, lsn) whenever a key's latest value changes;
    * tombstones emit a null value and clear state. The stable-API
    * stateful path (transformWithState being the 4.x successor). */
  case class Change(pk: Long, lsn: Long, op: String, value: Double)
  case class KeyState(lsn: Long, value: Double)
  case class StateOut(pk: Long, lsn: Long, value: Option[Double])

  def runningState(changes: Dataset[Change]): Dataset[StateOut] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[KeyState, StateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (pk: Long, rows: Iterator[Change], state: GroupState[KeyState]) =>
          val sorted = rows.toSeq.sortBy(_.lsn)
          val prior = state.getOption
          val latest = sorted.lastOption
          latest match {
            case Some(c) if prior.forall(_.lsn < c.lsn) =>
              if (c.op == "d") {
                state.remove()
                Iterator(StateOut(pk, c.lsn, None))
              } else {
                state.update(KeyState(c.lsn, c.value))
                Iterator(StateOut(pk, c.lsn, Some(c.value)))
              }
            case _ => Iterator.empty
          }
      }
  }
}
