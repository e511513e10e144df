package graft.sources

import org.apache.spark.sql.graft.SinkBridge
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.cdc.PartitionedUpsert

/** Native streaming WRITE into graft tables —
  * `df.writeStream.format("graft").option("checkpointLocation", …)
  * .start(dir)` — completing the DSv2 format face (batch read ✓,
  * batch write ✓, streaming CDF read ✓, and now streaming write).
  *
  * WHY a V1 [[Sink]] and not a DSv2 `StreamingWrite` (the honest
  * lowering question): `StreamingWrite` hands the sink isolated
  * per-partition row iterators plus a driver-side commit — the right
  * shape for a sink that APPENDS FILES. An upsert commit is not that:
  * it must route the batch by the table's bucketing, JOIN it against
  * the current contents of exactly the touched buckets, apply per-key
  * LWW, and rewrite those buckets — a multi-stage DECLARATIVE plan
  * over the whole batch. The V1 `Sink.addBatch` contract hands the
  * sink the batch as a DataFrame and full planning control, which is
  * why Delta Lake's streaming sink (public `DeltaSink`) sits on the
  * same V1 interface to this day. [[GraftTable]] deliberately does
  * NOT declare `STREAMING_WRITE`, which routes `writeStream
  * .format("graft")` to [[GraftDataSource.createSink]] (Spark's
  * documented V1 fallback — `DataStreamWriter` resolves the DSv2
  * table first and falls back when the capability is absent).
  *
  * EXACTLY-ONCE: each epoch commits through [[PartitionedUpsert
  * .merge]] with `txn = (appId, batchId)` — the Delta
  * txnAppId/txnVersion pattern the manifest already speaks. `appId`
  * defaults to the streaming query's checkpoint-stable id (Spark
  * publishes it to the task-local property `sql.streaming.queryId`;
  * stable across restarts from the same checkpoint) and can be pinned
  * with `option("txnAppId", …)` for pipelines that rebuild their
  * checkpoint. A replayed epoch (restart after a sink commit but
  * before the engine's own commit-log write) hits the manifest's
  * recorded cursor and returns WITHOUT executing the batch plan,
  * reading table data, or burning a table version.
  *
  * SEMANTICS per [[OutputMode]] — all three map onto engine-native
  * commits:
  *  - Append / Update: APPEND-AS-UPSERT, the same contract as batch
  *    `INSERT INTO` on this format (the only append a keyed table can
  *    honor): every row is an op='u' change at lsn = manifest version
  *    + 1. The two modes differ only in what Spark lets PRECEDE the
  *    sink (Update permits streaming aggregations emitting changed
  *    keys — exactly the rows an upsert wants).
  *  - Complete: each epoch is the FULL result — lowered onto the
  *    atomic [[PartitionedUpsert.replace]] (one manifest swap, old
  *    versions time-travelable), with the same per-epoch idempotence.
  *
  * CDC-SHAPED STREAMS: `option("opCol", c)` marks a column carrying
  * op codes ('d' = delete, anything else upsert) and
  * `option("lsnCol", c)` a column carrying the ordering the per-key
  * LWW resolves by — together they make the sink a full CDC applier
  * (the foreachBatch recipe in [[graft.streaming.CdcStream]], now as
  * a format). Without `lsnCol`, a key duplicated WITHIN one epoch is
  * an executor-raised error (the winner would be
  * shuffle-nondeterministic — the same line batch INSERT draws);
  * with it, intra-epoch duplicates resolve by the lsn like any CDC
  * feed.
  *
  * FULL PARITY with the foreachBatch sink (r17 — the merge body IS
  * [[graft.streaming.CdcStream.mergeBatch]], shared so quarantine
  * semantics, the delete-only tombstone fast path, and txn plumbing
  * cannot drift between the two faces):
  *  - `option("sparse", "true")` — TOAST-style partial after-images
  *    (requires opCol+lsnCol; stream carries `<col>_present` flags);
  *  - `option("quarantineDir", d)` — CHECK-constraint dead-lettering
  *    instead of query death (merged-image evaluation under sparse);
  *  - `option("compactEvery", n)` / `option("compactMaxFiles", m)` —
  *    auto-compaction cadence on the sink's own trigger thread.
  * The one thing the format face cannot carry is the foreachBatch
  * recipe's cross-batch `dropDuplicates(lsnCol)` redelivery
  * suppression (a sink cannot inject stateful operators upstream) —
  * an at-least-once source should keep per-key LWW ordering in its
  * lsn, which makes redelivery convergent; Delta's sink draws the
  * same line.
  *
  * Scale: the per-epoch cost is the merge's — O(touched buckets)
  * data, one manifest read + one manifest publish of metadata. An
  * empty epoch burns nothing (merge's `touched.isEmpty` no-op). The
  * micro-batch plan executes exactly once ([[SinkBridge]] — the
  * ForeachBatchSink bridge), feeding the merge's pipeline directly
  * with zero row-format conversions and zero driver materialization. */
final class GraftStreamingSink(dir: String, parameters: Map[String, String],
                               outputMode: OutputMode) extends Sink {

  override def name(): String = s"graft-sink.`$dir`"

  private def appIdOf(spark: SparkSession): String =
    parameters.getOrElse("txnAppId",
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
        .getOrElse(throw new IllegalStateException(
          "graft sink could not resolve a streaming query id for its " +
            "exactly-once cursor — pass option(\"txnAppId\", …)")))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val appId = appIdOf(spark)
    // replay fast-path BEFORE touching the batch plan: a re-delivered
    // epoch must not re-execute the (possibly expensive) upstream
    if (m.txns.get(appId).exists(_ >= batchId)) return

    val opCol = parameters.get("opCol")
    val lsnCol = parameters.get("lsnCol")
    val sparse = parameters.get("sparse").exists(_.toBoolean)
    val quarantineDir = parameters.get("quarantineDir")
    val compactEvery = parameters.get("compactEvery").map(_.toInt).getOrElse(0)
    val compactMaxFiles =
      parameters.get("compactMaxFiles").map(_.toInt).getOrElse(8)
    if (sparse) require(opCol.nonEmpty && lsnCol.nonEmpty,
      "sparse partial after-images are CDC-ordered by contract — pass " +
        "opCol and lsnCol with sparse=true")
    val keyCol = m.keyCol
    val valueCols = m.schema.fieldNames.filterNot(
      _.equalsIgnoreCase(keyCol)).toSeq
    // schema gate: stream columns = table columns (+ op/lsn metadata;
    // + per-value-column `_present` flags under sparse)
    val metaCols = ((opCol.toSeq ++ lsnCol.toSeq) ++
      (if (sparse) valueCols.map(_ + "_present") else Seq.empty))
      .map(_.toLowerCase).toSet
    val streamCols = data.schema.fieldNames.map(_.toLowerCase).toSet
    // every DECLARED metadata column must actually be in the stream
    // (ADVICE r17: a sparse stream missing a `<col>_present` flag or
    // the named opCol/lsnCol previously passed the subtract-only gate
    // and died later inside Cdc.applySparse with an unresolved-column
    // error instead of this message)
    val missingMeta = metaCols -- streamCols
    if (missingMeta.nonEmpty)
      throw new IllegalArgumentException(
        s"stream is missing declared metadata column(s) " +
          s"${missingMeta.toSeq.sorted.mkString(", ")} " +
          "(opCol/lsnCol, plus one <col>_present flag per table value " +
          s"column under sparse) at $dir")
    val got = streamCols -- metaCols
    val want = m.schema.fieldNames.map(_.toLowerCase).toSet
    if (got != want)
      throw new IllegalArgumentException(
        s"stream schema ${got.toSeq.sorted.mkString(",")} does not match " +
          s"table schema ${want.toSeq.sorted.mkString(",")} at $dir" +
          (if (metaCols.nonEmpty) s" (opCol/lsnCol/_present are metadata)"
           else ""))
    opCol.foreach(c => require(!want.contains(c.toLowerCase),
      s"opCol '$c' collides with a table column"))
    lsnCol.foreach(c => require(!want.contains(c.toLowerCase),
      s"lsnCol '$c' collides with a table column"))

    val batch = SinkBridge.microBatchAsBatch(data)

    if (outputMode == OutputMode.Complete()) {
      require(opCol.isEmpty && lsnCol.isEmpty && !sparse,
        "opCol/lsnCol/sparse are CDC-apply options — meaningless in " +
          "Complete mode, whose every epoch replaces the full table")
      PartitionedUpsert.replace(
        GraftWrites.guardKeys(batch, keyCol, strictDups = true)
          .select(m.schema.fieldNames.map(col).toSeq: _*),
        dir, txn = Some(appId -> batchId))
    } else {
      // Append / Update: upsert merge through the SAME shared batch
      // body the foreachBatch recipe uses (CdcStream.mergeBatch —
      // quarantine semantics, delete-only tombstone fast path, and
      // txn plumbing stay one copy). Without lsnCol the epoch is one
      // "statement": intra-epoch duplicate keys error
      // (nondeterministic winner); with lsnCol the CDC ordering
      // resolves them. Plain mode (no opCol) skips the delete-only
      // probe — its synthesized op='u' literal could never match.
      val guarded = GraftWrites.guardKeys(batch, keyCol,
        strictDups = lsnCol.isEmpty)
      val sparseCols =
        if (sparse) valueCols.map(c => col(s"${c}_present")) else Seq.empty
      val changes = guarded.select(
        opCol.map(col(_).as("__op")).getOrElse(lit("u").as("__op")) +:
          lsnCol.map(col(_).cast("long").as("__lsn"))
            .getOrElse(lit(m.version + 1).as("__lsn")) +:
          ((keyCol +: valueCols).map(col) ++ sparseCols): _*)
      graft.streaming.CdcStream.mergeBatch(spark, changes, batchId, dir,
        appId, keyCol, "__lsn", "__op", valueCols, m.nBuckets,
        sparse = sparse, quarantineDir = quarantineDir,
        probeDeleteOnly = opCol.nonEmpty)
      if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
        PartitionedUpsert.compactFiles(spark, dir, compactMaxFiles): Unit
    }
  }
}
