package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2-J streaming transforms (Structured Streaming).
  *
  * All functions are plain DataFrame → DataFrame and work on streaming
  * inputs (watermark-gated state) — validated with MemoryStream in
  * StreamingSpec since streaming has no DuckDB oracle.
  *
  * Scale notes: every stateful op keys its state by the group columns,
  * so state lives with the shuffle partition and is bounded by the
  * watermark TTL — the two properties that keep streaming state sane
  * at 100 TB/day ingest. On a real cluster the RocksDB state store
  * provider + changelog checkpointing is the posture
  * (spark.sql.streaming.stateStore.providerClass); tests run the
  * default HDFS-backed store.
  */
object Streams {

  /** Tumbling-window counts with watermarked late-data drop. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(keyCol), col("n"), col("sum_value"))

  /** Sliding-window counts (each event lands in len/slide windows). */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(keyCol), col("n"))

  /** Session windows: events within `gap` of each other merge. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col(keyCol), col("n"))

  /** Custom sessionization on transformWithState EVENT-TIME timers —
    * gap timeout PLUS a max-events split and a closed_by audit column,
    * the two things `session_window` cannot express
    * ([[StateProcessors.SessionGap]] owns the semantics). Input needs
    * `user`/`tsMs`/`v` columns and a watermark on `tsCol` (the caller
    * keeps the timestamp column; tsMs is its epoch-millis shadow the
    * processor folds on). Requires the RocksDB provider like every
    * TWS path. */
  def sessionizeTws(events: DataFrame, tsCol: String, gapMs: Long,
                    maxEvents: Int, watermark: String): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark(tsCol, watermark)
      .select(col("user"),
        (col(tsCol).cast("double") * 1000).cast("long").as("tsMs"),
        col("v"))
      .as[StateProcessors.SessEvent]
      .groupByKey(_.user)
      .transformWithState(
        new StateProcessors.SessionGap(gapMs, maxEvents),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  /** Streaming dedup with bounded state (Spark 4
    * dropDuplicatesWithinWatermark: duplicates arriving within the
    * watermark delay are dropped; state expires after it). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keys: Seq[String], watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: stream side stays streaming; the dim
    * table is broadcast per micro-batch (no stream state). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** Stream-stream interval join: both sides watermarked; right rows
    * join left rows within [left.ts, left.ts + upperBound]. State on
    * both sides is pruned once the watermark passes the bound. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   watermark: String, upperBound: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperBound"))
  }
}
