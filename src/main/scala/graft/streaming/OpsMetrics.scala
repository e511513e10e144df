package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: every CDC product ships a throughput/lag
  * dashboard, and the raw material is Spark's OWN per-trigger progress
  * telemetry — so this records it instead of re-instrumenting sinks.
  * A [[StreamingQueryListener]] writes each micro-batch's progress
  * JSON to one file under `dir/<queryId>/` (atomic single-file create;
  * no shared append, so concurrent queries and driver crashes cannot
  * interleave or truncate records), and [[table]] reads the directory
  * back as a queryable DataFrame — batch durations, input rates, row
  * counts, per-source offsets, state-store sizes.
  *
  * Scale shape: one small file per trigger per query. At dashboard
  * cadence that is thousands of files a day — compact them with the
  * corpus tooling on the operator's schedule (the metrics are
  * append-only observations; compaction cannot lose semantics). The
  * recorder deliberately captures the engine's JSON verbatim: fields
  * evolve with Spark versions, and a typed projection belongs in the
  * reader ([[table]] exposes the core columns and keeps the raw JSON
  * for everything else). */
class OpsMetrics(spark: SparkSession, dir: String)
    extends StreamingQueryListener {

  private val fs = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    // (queryId, batchId) names the record: a restarted query (new
    // runId) replaying a batch OVERWRITES rather than duplicates —
    // last observation wins, which is the truthful one
    val path = new Path(s"$dir/${p.id}/batch-%010d.json".format(p.batchId))
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    try out.write(p.json.getBytes("UTF-8")) finally out.close()
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object OpsMetrics {

  /** Attach a recorder to the session (returns it so the caller can
    * detach with `spark.streams.removeListener`). */
  def attach(spark: SparkSession, dir: String): OpsMetrics = {
    val m = new OpsMetrics(spark, dir)
    spark.streams.addListener(m)
    m
  }

  /** The recorded telemetry as a DataFrame: core columns typed
    * (query_id, batch_id, ts, input_rows, rows_per_sec, batch_ms,
    * sink_description), full progress JSON carried in `raw` for
    * everything else (per-source offsets, state operators, watermark). */
  def table(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("wholetext", true).text(s"$dir/*/*.json")
      .withColumnRenamed("value", "raw")
    raw.select(
      get_json_object(col("raw"), "$.id").as("query_id"),
      get_json_object(col("raw"), "$.batchId").cast("long").as("batch_id"),
      to_timestamp(get_json_object(col("raw"), "$.timestamp")).as("ts"),
      get_json_object(col("raw"), "$.numInputRows").cast("long")
        .as("input_rows"),
      get_json_object(col("raw"), "$.inputRowsPerSecond").cast("double")
        .as("rows_per_sec"),
      get_json_object(col("raw"), "$.durationMs.triggerExecution")
        .cast("long").as("batch_ms"),
      get_json_object(col("raw"), "$.sink.description")
        .as("sink_description"),
      col("raw"))
  }

  /** Per-query health rollup — the dashboard summary row: batches,
    * total rows, p50/max batch duration, last batch id/time. */
  def summary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir).groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("input_rows")).as("total_rows"),
        expr("percentile(batch_ms, 0.5)").as("p50_batch_ms"),
        max(col("batch_ms")).as("max_batch_ms"),
        max(col("batch_id")).as("last_batch_id"),
        max(col("ts")).as("last_ts"))
}
