package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // -------------------------------------------------------------------
  // Key-routed version CHAIN table: one row per key carrying the FULL
  // version chain as an array ascending by (valid_from, lsn). The
  // history table is bucketed by (key, lsn) — right for append volume,
  // wrong for point-in-time lookups by key (no bucket pruning). The
  // chain layout inverts the trade: `readForKeys` prunes to exactly the
  // touched keys' buckets, and the version-in-force at ts is a PER-ROW
  // array scan (filter + element_at(-1)) — no explode, no window, no
  // join beyond the key equi-join. This is the layout the
  // asofEnrichSink late path wants: with it, LATE events are O(batch)
  // too, instead of an O(history) residual scan.
  //
  // The dial: chain length. A key rewritten hourly for a year carries
  // ~9k versions in one row — fine; a key rewritten per second is a
  // pathological hot key whose chain must be truncated
  // ([[truncateChains]], horizon-bounded, same contract shape as the
  // LWW tombstone reap) or left to the history table. Both layouts are
  // maintained from the same batches under the same txn, so they never
  // disagree.
  // -------------------------------------------------------------------

  private def versionStruct(lsnCol: String, tsCol: String,
                            valueCols: Seq[String]): Column =
    struct(col(lsnCol) +: col(tsCol) +: valueCols.map(col): _*)

  /** Initialize the chain table (no rows written — schema from the
    * template batch). Idempotent per target, like [[init]]. */
  def initChain(template: DataFrame, chainDir: String, keyCol: String,
                lsnCol: String, tsCol: String, valueCols: Seq[String],
                nBuckets: Int): Unit = {
    val spark = template.sparkSession
    val empty = template
      .select(col(keyCol),
        array(versionStruct(lsnCol, tsCol, valueCols)).as("versions"))
      .limit(0)
    if (PartitionedUpsert.currentManifest(spark, chainDir).isEmpty)
      PartitionedUpsert.init(empty, chainDir, keyCol, nBuckets)
  }

  /** Append one micro-batch's versions to the touched keys' chains.
    * Same in-order contract as [[applyBatch]] (batch lsns above every
    * applied lsn per key), so the append is a concat of two sorted
    * runs — the stored chain and the batch's own sorted versions.
    * O(batch): prior chains come from a bucket-pruned point read. */
  def applyBatchChain(spark: SparkSession, chainDir: String,
                      batch: DataFrame, keyCol: String, lsnCol: String,
                      tsCol: String, valueCols: Seq[String], nBuckets: Int,
                      txn: Option[(String, Long)] = None): Long = {
    val cols = Seq(keyCol, lsnCol, tsCol) ++ valueCols
    val b = batch.select(cols.map(col): _*).persist()
    try {
      if (b.isEmpty) return 0L
      val wm = b.agg(max(col(lsnCol)
        .cast(org.apache.spark.sql.types.LongType))).head().getLong(0)
      val keys = b.select(col(keyCol)).distinct()
      val prior = PartitionedUpsert.readForKeys(spark, chainDir, keys, keyCol)
        .join(keys, Seq(keyCol), "left_semi")
        .select(col(keyCol), col("versions").as("__prior"))
      val batchChains = b
        .groupBy(col(keyCol))
        .agg(array_sort(collect_list(
          versionStruct(lsnCol, tsCol, valueCols))).as("__new"))
      val merged = batchChains.join(prior, Seq(keyCol), "left")
        .select(col(keyCol),
          lit(wm).as("__mlsn"), lit("u").as("__mop"),
          concat(coalesce(col("__prior"),
            array().cast(prior.schema("__prior").dataType)),
            col("__new")).as("versions"))
      PartitionedUpsert.merge(spark, chainDir, merged, keyCol, "__mlsn",
        "__mop", Seq("versions"), nBuckets, txn).length.toLong
    } finally { b.unpersist(); () }
  }

  /** Version-in-force lookup: enrich `events` with the chain version
    * whose valid_from is the greatest at-or-before the event's ts —
    * NULL dim columns when no version covers it (pre-first-version or
    * unknown key). One key equi-join against a bucket-pruned chain
    * read, then a per-row array scan: no explode, no window. Output =
    * events' columns + `dim_<c>` per value column + dim_lsn /
    * dim_valid_from provenance (the asofEnrichSink shape). */
  def chainAsOf(spark: SparkSession, chainDir: String, events: DataFrame,
                keyCol: String, tsCol: String,
                valueCols: Seq[String]): DataFrame = {
    val keys = events.select(col(keyCol)).distinct()
    val chains = PartitionedUpsert.readForKeys(spark, chainDir, keys, keyCol)
      .join(keys, Seq(keyCol), "left_semi")
    // lambda references the event's ts — fine: it is an attribute, not
    // a re-evaluated expression tree (the charShingles rule)
    val joined = events.join(chains, Seq(keyCol), "left")
    val covered = filter(col("versions"),
      v => v.getField(tsCol) <= col(tsCol))
    val inForce = element_at(covered, -1)
    joined
      .withColumn("__v", when(size(covered) > 0, inForce))
      .select(events.columns.map(col) ++
        valueCols.map(c => col(s"__v.$c").as(s"dim_$c")) ++ Seq(
        col(s"__v.${colNameLsn(chains)}").as("dim_lsn"),
        col(s"__v.$tsCol").as("dim_valid_from")): _*)
  }

  /** The chain's lsn field name — first field of the version struct
    * (fixed by [[versionStruct]]'s construction order). */
  private def colNameLsn(chains: DataFrame): String =
    chains.schema("versions").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.head

  /** Truncate chains below a horizon: versions strictly superseded
    * before `horizon` are dropped, KEEPING the version in force AT the
    * horizon (it still answers lookups for ts ≥ horizon). After a
    * truncation, lookups for ts < horizon are out of contract —
    * exactly the LWW stability-horizon shape, stated rather than
    * implied. Returns the number of keys whose chains shrank. */
  def truncateChains(spark: SparkSession, chainDir: String,
                     tsCol: String, horizon: Long,
                     nBuckets: Int): Long = {
    val all = PartitionedUpsert.read(spark, chainDir)
    val covered = filter(col("versions"),
      v => v.getField(tsCol) <= lit(horizon))
    // keep from the version in force at the horizon onward; a chain
    // wholly above the horizon keeps everything (cnt 0 → slice from 1)
    val trimmed = all
      .withColumn("__cnt", size(covered))
      .withColumn("__keep",
        expr(s"slice(versions, greatest(__cnt, 1), size(versions))"))
      .filter(col("__cnt") > 1) // only chains that actually shrink
    val n = trimmed.count()
    if (n > 0) {
      val m = PartitionedUpsert.currentManifest(spark, chainDir).get
      // merge lsn: incoming rows always supersede stored bucket state
      // (Cdc.apply semantics), but the manifest's per-bucket lsn
      // watermark must stay MONOTONE for changesSinceLsn consumers —
      // global-max + 1 guarantees that and stays at-or-below the next
      // real batch (its lsns are strictly above all applied)
      val wm = all.agg(max(expr("versions[size(versions)-1]." +
        colNameLsn(all)))).head().getLong(0) + 1L
      PartitionedUpsert.merge(spark, chainDir,
        trimmed.select(col(m.keyCol), lit(wm).as("__mlsn"),
          lit("u").as("__mop"), col("__keep").as("versions")),
        m.keyCol, "__mlsn", "__mop", Seq("versions"), nBuckets): Unit
    }
    n
  }
}
