package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SCD Type-2 maintenance: keep a versioned history table
  * current PER MICRO-BATCH instead of re-deriving it from the complete
  * log every run (Cdc.scd2 / q_cdc_scd2 — correct, but O(log) each
  * time; at 100 TB the history must be maintained, not recomputed).
  *
  * Two manifest-committed upsert targets:
  *  - `historyDir`, row identity `hkey = struct(key, lsn)` — one row
  *    per key-version carrying [valid_from, valid_to) and is_current,
  *    exactly the Cdc.scd2 shape;
  *  - `openDir`, keyed by `key` — the current OPEN version per key,
  *    duplicated here so a batch can find the intervals it must close
  *    with a bucket-pruned point-lookup (readForKeys is O(batch));
  *    routing by key inside the history table is impossible, because
  *    its buckets hash the (key, lsn) pair.
  *
  * A batch closes each touched key's open interval (valid_to := the
  * key's first new event time, is_current := false), chains the new
  * events within the batch, and appends them as version rows — ONE
  * window over (open ∪ batch) rows ordered by lsn does all of it.
  * Both merges carry the same (appId, batchId) transaction, so the
  * sequence is exactly-once under kill-and-resume: a crash between the
  * two merges replays with the history merge recognized as applied
  * (metadata no-op, its rows were identical anyway) and the open-table
  * merge completing the batch.
  *
  * Requires in-order delivery per key (batch lsns above every applied
  * lsn for that key) — the same contract every log-ordered CDC
  * consumer in this package assumes; out-of-order events belong to the
  * batch-recompute path. */
object Scd2Maintain {

  /** Initialize both targets from an empty history (schemas derived
    * from a template batch — no rows are written). Idempotent PER
    * TARGET: a crash between the two inits must be healable by calling
    * init again (the streaming sink's lazy-init does exactly that), so
    * an already-initialized target is skipped instead of throwing. */
  def init(template: DataFrame, historyDir: String, openDir: String,
           keyCol: String, lsnCol: String, tsCol: String,
           valueCols: Seq[String], nBuckets: Int): Unit = {
    val spark = template.sparkSession
    val base = template.select(
      (Seq(keyCol, lsnCol, tsCol) ++ valueCols).map(col): _*)
    val openEmpty = base.limit(0)
    val histEmpty = base
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", col(tsCol))
      .withColumn("is_current", lit(true))
      .withColumn("hkey", struct(col(keyCol), col(lsnCol)))
      .limit(0)
    if (PartitionedUpsert.currentManifest(spark, historyDir).isEmpty)
      PartitionedUpsert.init(histEmpty, historyDir, "hkey", nBuckets)
    if (PartitionedUpsert.currentManifest(spark, openDir).isEmpty)
      PartitionedUpsert.init(openEmpty, openDir, keyCol, nBuckets)
  }

  /** The pure chain step — the algebra of incremental SCD2 upkeep,
    * factored out so the oracled twin (q_cdc_scd2_incr) and the
    * table-backed [[applyBatch]] share one implementation: one window
    * over (open ∪ batch) rows per key closes each open interval at its
    * key's first new event and chains the new versions; an open row
    * whose key has no new events keeps lead = null and stays current. */
  def chainBatch(open: DataFrame, batch: DataFrame, keyCol: String,
                 lsnCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(lsnCol).asc)
    open.unionByName(batch)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
  }

  /** Apply one micro-batch of change events (key, lsn, ts, values…).
    * `txn` = (writerAppId, monotonic batchId) — pass it from a
    * streaming sink's batchId for exactly-once under restart. Returns
    * the number of history rows written/rewritten (0 for an empty or
    * replayed batch). */
  def applyBatch(spark: SparkSession, historyDir: String, openDir: String,
                 batch: DataFrame, keyCol: String, lsnCol: String,
                 tsCol: String, valueCols: Seq[String], nBuckets: Int,
                 txn: Option[(String, Long)] = None): Long =
    applyBatchWithFailpoint(spark, historyDir, openDir, batch, keyCol,
      lsnCol, tsCol, valueCols, nBuckets, txn, crashAfterHistory = false)

  /** [[applyBatch]] with a crash injected between the two merges —
    * the seam that makes the heal-on-replay guarantee directly
    * testable (the prepare/commit split precedent). */
  private[cdc] def applyBatchWithFailpoint(spark: SparkSession,
      historyDir: String, openDir: String, batch: DataFrame,
      keyCol: String, lsnCol: String, tsCol: String,
      valueCols: Seq[String], nBuckets: Int, txn: Option[(String, Long)],
      crashAfterHistory: Boolean): Long = {
    val cols = Seq(keyCol, lsnCol, tsCol) ++ valueCols
    // pinned: the batch feeds the key collect, the chain window, and
    // both merges — an unpersisted non-deterministic source could
    // change rows between them
    val b = batch.select(cols.map(col): _*).persist()
    try {
      if (b.isEmpty) return 0L
      // merge-order lsn for rewritten history rows: strictly above any
      // prior batch's (lsn is monotonic across batches per contract),
      // so the closing rewrite of an open row wins LWW deterministically
      // (cast: an IntegerType lsn must not ClassCastException here when
      // the merge path itself casts tolerantly)
      val wm = b.agg(max(col(lsnCol)
        .cast(org.apache.spark.sql.types.LongType))).head().getLong(0)
      val keys = b.select(col(keyCol)).distinct()
      // open intervals of exactly the batch's keys — bucket-pruned
      // point lookup, then restricted to the batch keys (readForKeys
      // returns whole buckets)
      val open = PartitionedUpsert.readForKeys(spark, openDir, keys, keyCol)
        .join(keys, Seq(keyCol), "left_semi")
      // one window chains open + new rows per key: the open row's lead
      // is the key's first new event (closing its interval); the last
      // new row has no lead and stays current
      // pinned like `b`: the history merge, the open merge, and the
      // returned count all consume this frame — unpersisted, the chain
      // window and the open-bucket read would run three times
      val chained = chainBatch(open, b, keyCol, lsnCol, tsCol).persist()
      try {
        val histCols = cols ++ Seq("valid_from", "valid_to", "is_current")
        val hist = chained.select(
          struct(col(keyCol), col(lsnCol)).as("hkey") +:
            lit(wm).as("__mlsn") +: lit("u").as("__mop") +:
            histCols.map(col): _*)
        val written = PartitionedUpsert.merge(spark, historyDir, hist,
          "hkey", "__mlsn", "__mop", histCols, nBuckets, txn)
        if (crashAfterHistory)
          throw new RuntimeException("injected crash between merges")
        // the key's new open version replaces the old one (keyed by key,
        // so the close-and-replace is a single upsert per key)
        val newOpen = chained.filter(col("is_current"))
          .select(lit(wm).as("__mlsn") +: lit("u").as("__mop") +:
            cols.map(col): _*)
        PartitionedUpsert.merge(spark, openDir, newOpen,
          keyCol, "__mlsn", "__mop", cols.filterNot(_ == keyCol), nBuckets, txn)
        if (written.isEmpty) 0L else chained.count()
      } finally { chained.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** The maintained history, in Cdc.scd2's column shape. */
  def readHistory(spark: SparkSession, historyDir: String): DataFrame =
    PartitionedUpsert.read(spark, historyDir).drop("hkey")
}
