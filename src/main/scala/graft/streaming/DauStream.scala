package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.ops.cdc.PartitionedUpsert

/** Streaming maintenance of the per-day active-user HLL blob table —
  * the incremental half of [[graft.ops.cdc.Quality.activeUsersApprox]]
  * (VERDICT r13 #4's rung, made a maintained sink): each micro-batch
  * of (user_id, ts) events folds into ONE mergeable sketch per
  * touched day, so the table holds O(days × 4KB) state while serving
  * the DAU/WAU/MAU series over ANY event volume, and a day's blob is
  * never rebuilt from history — `hll_union` of the batch partial into
  * the stored blob is O(touched days) per trigger.
  *
  * Storage is a [[PartitionedUpsert]] table keyed by epoch-day (the
  * manifest-committed format every maintainer here uses), so reads
  * are atomic-versioned and the point-lookup of a batch's touched
  * days is bucket-pruned (`readForKeys` — cost bounded by the BATCH's
  * day span, not the table).
  *
  * Exactly-once, twice over: (a) the merge carries txn =
  * (checkpoint, batchId), so a replayed micro-batch is a manifest
  * metadata no-op (the Delta txnAppId pattern all sinks here use);
  * (b) even WITHOUT the guard, re-delivering the same (user, day)
  * pairs is value-level idempotent — an HLL union of already-present
  * coupons changes nothing — so at-least-once upstreams degrade the
  * count by zero, a property exact counter sinks cannot offer (and
  * the reason sketches, not counts, are the right streamed engagement
  * state). The guard still matters: it skips the read+write entirely.
  *
  * The union-only algebra means DELETES cannot be subtracted (the
  * NdvMaintain staleness trade); day partitions of an append-only
  * event stream never retract, so the limitation is structural, not
  * practical — a GDPR-style purge rebuilds the affected days' blobs
  * from the source, which stays O(purged days), not O(history).
  */
object DauStream {

  val LgK = 12

  private val blobSchema = StructType(Seq(
    // day number since 1970-01-01 of the SESSION-LOCAL day (datediff —
    // the integer twin of date_trunc('day', ts), so blob keys agree
    // with the in-query rung's day buckets in ANY session timezone;
    // under the harness's UTC session this is the UTC epoch day). The
    // earlier unix_timestamp(date_trunc(...)) DIV 86400 form shifted
    // every key by one day in positive-offset timezones (r14 review).
    StructField("d", LongType),
    StructField("sketch", BinaryType)))

  /** Create an empty blob table. */
  def init(spark: SparkSession, blobDir: String, nBuckets: Int = 8): Unit =
    PartitionedUpsert.init(
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        blobSchema),
      blobDir, "d", nBuckets)

  /** Fold one batch of (user_id, ts) rows into the blob table.
    * Exposed for direct (non-streaming) backfill use; `lsn` orders
    * writers (the stream passes batchId). */
  def mergeBatch(spark: SparkSession, blobDir: String, batch: DataFrame,
                 lsn: Long, txn: Option[(String, Long)] = None): Unit = {
    val m = PartitionedUpsert.manifestOrFail(spark, blobDir)
    // batch partial sketches, pinned: the touched-day lookup and the
    // union both consume them (one pass over the batch either way)
    val bb = batch.select(dayOf(col("ts")).as("d"), col("user_id"))
      .groupBy(col("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("s_new"))
      .localCheckpoint()
    val prior = PartitionedUpsert
      .readForKeys(spark, blobDir, bb.select(col("d")), "d")
      .select(col("d"), col("sketch").as("s_old"))
    val merged = bb.join(prior, Seq("d"), "left")
      .select(col("d"),
        when(col("s_old").isNull, col("s_new"))
          .otherwise(hll_union(col("s_new"), col("s_old"), allowDifferentLgConfigK = false))
          .as("sketch"))
      .withColumn("__op", lit("u"))
      .withColumn("__lsn", lit(lsn))
    PartitionedUpsert.merge(spark, blobDir, merged, "d", "__lsn", "__op",
      Seq("sketch"), m.nBuckets, txn): Unit
  }

  /** REBUILD the blobs for a set of days from a (already-purged)
    * source slice — the operational answer to the union-only algebra:
    * an HLL cannot subtract a user, so a GDPR-style purge recomputes
    * the affected days' sketches from the post-purge source and
    * REPLACES those blobs (op 'u'), deleting a day outright (op 'd')
    * when no events remain. Cost is O(purged days' events), never
    * O(history): `days` scopes the rewrite, and the source frame
    * should already be filtered to those days (it is filtered here
    * again, so passing the full purged corpus is merely wasteful, not
    * wrong).
    *
    * `source` = post-purge (user_id, ts) events; `days` = the
    * affected day numbers as ANY frame with a `d` column in blob-key
    * units (what `datediff(ts, DATE'1970-01-01')` yields — obtain via
    * [[dayOf]]). */
  def rebuildDays(spark: SparkSession, blobDir: String, source: DataFrame,
                  days: DataFrame, lsn: Long,
                  txn: Option[(String, Long)] = None): Unit = {
    val m = PartitionedUpsert.manifestOrFail(spark, blobDir)
    // pinned: consumed twice (the left_semi source filter AND the
    // change-op left join) — an unpinned nondeterministic frame could
    // filter one day set and join another, deleting a live day's blob
    val dayKeys = days.select(col("d").cast("long").as("d")).distinct()
      .localCheckpoint()
    val rebuilt = source
      .select(dayOf(col("ts")).as("d"), col("user_id"))
      .join(dayKeys, Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("s_new"))
    val changes = dayKeys.join(rebuilt, Seq("d"), "left")
      .select(col("d"),
        col("s_new").as("sketch"),
        when(col("s_new").isNull, lit("d")).otherwise(lit("u")).as("__op"),
        lit(lsn).as("__lsn"))
    PartitionedUpsert.merge(spark, blobDir, changes, "d", "__lsn", "__op",
      Seq("sketch"), m.nBuckets, txn): Unit
  }

  /** The blob-table day key of a timestamp column — the integer twin
    * of date_trunc('day', ts). */
  def dayOf(ts: Column): Column =
    datediff(ts, lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")

  /** Streaming sink: events (user_id, ts) → maintained day blobs. */
  def blobSink(events: DataFrame, blobDir: String,
               checkpointDir: String): StreamingQuery = {
    val spark = events.sparkSession
    PartitionedUpsert.manifestOrFail(spark, blobDir): Unit // fail at START
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(spark, blobDir, batch, lsn = batchId,
          txn = Some((checkpointDir, batchId)))
      }
      .start()
  }

  /** The maintained blob table as (d timestamp-day, sketch) — the
    * exact inverse of the merge key: day number → local-midnight
    * timestamp, i.e. the same values date_trunc('day', ts) yields. */
  def read(spark: SparkSession, blobDir: String): DataFrame =
    PartitionedUpsert.read(spark, blobDir)
      .select(
        expr("to_timestamp(date_add(DATE'1970-01-01', cast(d as int)))")
          .as("d"),
        col("sketch"))

  /** DAU/WAU/MAU series off the maintained blobs — the identical read
    * path the in-query rung uses ([[graft.ops.cdc.Quality.dauSeries]]),
    * now over state a stream kept current. */
  def series(spark: SparkSession, blobDir: String): DataFrame =
    graft.ops.cdc.Quality.dauSeries(read(spark, blobDir))
}
