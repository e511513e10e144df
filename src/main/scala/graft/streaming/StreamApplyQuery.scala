package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ops.cdc.LifecycleFixture

/** The streaming upsert path under the CROSS-ENGINE HASH GATE (r16
  * verdict #8): until now every streaming surface was scalatest-only
  * (streams have no DuckDB oracle); this key closes the gap by running
  * a REAL bounded stream inside the query function — the final table
  * state is a pure function of the input, so DuckDB can replay it
  * algebraically and the hash certifies the native streaming sink
  * (`writeStream.format("graft")`, r17), its opCol/lsnCol CDC-apply
  * face, per-epoch exactly-once cursors, and the upsert merge, all in
  * one key. */
object StreamApplyQuery {

  /** CDC-apply through the native streaming sink, certified
    * cross-engine: an upsert table is initialized from customer
    * (cents grid), the SAME change set q_scan_graft_dsv2 derives from
    * orders (aggregated balances; every 97th custkey remapped to a
    * ghost key, every 13th a DELETE, seg 'FED') is written as TWO
    * jsonl files hash-split on the key, and a file-source stream with
    * `maxFilesPerTrigger=1` drives them through `writeStream
    * .format("graft")` with opCol/lsnCol — two real micro-batch
    * epochs, each an engine merge commit with its own exactly-once
    * cursor. Keys are unique across the change set and the split is
    * BY KEY, so the final state is trigger-order-invariant — the
    * determinism the hash gate needs without constraining the
    * engine's scheduling. DuckDB replays the apply as one FULL OUTER
    * JOIN (change row wins, 'd' rows vanish, untouched rows pass).
    * Fixture: table pristine-restored per rep ([[LifecycleFixture]]);
    * input + checkpoint reset per rep (a fresh stream identity — the
    * restored table must not mistake the new run for a replay). */
  def qCdcStreamApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "stream_apply")
    val inDir = graft.ops.relational.Scans.fixtureDir(dir, "stream_apply_in")
    val ckpt = graft.ops.relational.Scans.fixtureDir(dir, "stream_apply_ck")
    val hconf = spark.sparkContext.hadoopConfiguration
    val cp = new org.apache.hadoop.fs.Path(ckpt)
    val cfs = cp.getFileSystem(hconf)
    if (cfs.exists(cp)) cfs.delete(cp, true)
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      Tables.table(spark, dir, "customer").select(
        $"c_custkey",
        round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
        $"c_mktsegment".as("seg")).coalesce(1)
    }
    // two epochs, split BY KEY (order-invariant final state); a plain
    // distributed write — no driver materialization of the change set
    changeSet(spark, dir).repartition(2, $"c_custkey")
      .write.mode("overwrite").json(inDir)
    val sch = StructType(Seq(
      StructField("__op", StringType), StructField("__lsn", LongType),
      StructField("c_custkey", LongType), StructField("bal_cents", LongType),
      StructField("seg", StringType)))
    // per-trigger shuffles sized to the fixture's bucket count for the
    // drain (the q_cdc_stream_agg discipline, r19: a 15k-row 4-bucket
    // fixture under the session's 32 global partitions pays 8× the
    // reduce-task fan-out per trigger for nothing — production sizes
    // the stream to its data volume the same way; the applied end
    // state is partitioning-invariant, oracle hash untouched)
    // scope held through start AND drain: the sink's merges read the
    // session conf at execution time (single-threaded invariant
    // documented once at graft.ConfScope)
    graft.ConfScope.withShufflePartitions(spark, 4) {
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").json(inDir)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .option("opCol", "__op").option("lsnCol", "__lsn")
        .start(path)
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.format("graft").load(path)
      .select($"c_custkey", $"bal_cents", $"seg")
      .orderBy($"c_custkey")
  }

  /** The streaming CDF READ under the hash gate (r17 verdict #8 — the
    * read-side twin of [[qCdcStreamApply]]): a LIVE
    * `startingVersion=snapshot` stream is started on the pristine
    * table, drains its initial snapshot (every current row as
    * `insert` records), then ONE deterministic merge (the same
    * orders-derived change set) lands WHILE THE STREAM RUNS and the
    * tail drains its row-level insert/update/delete records; the
    * accumulated parquet output is the key's result. DuckDB replays
    * the feed algebraically: snapshot = customer as inserts; tail =
    * the change set classified against the snapshot (matched 'u' →
    * update, unmatched 'u' → insert, matched 'd' → delete with NULL
    * values, unmatched 'd' → nothing — a delete of an absent key
    * changes no state, so the diff emits no record; identical-image
    * updates cannot occur because seg flips to 'FED', never a real
    * segment). One hash certifies the snapshot-then-tail composition,
    * the spooled window diff, the micro-batch offsets, and the V1
    * bridge together. (key, change_type) is unique across the output
    * — a key appears at most once in the snapshot and once in the
    * tail — so the ORDER BY is a total order and the hash is
    * schedule-invariant. Fixture: pristine restore + fresh checkpoint
    * and output dir per rep (stream identity must not mistake a
    * restored table for a replay). */
  def qCdcStreamCdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "stream_cdf")
    val outDir = graft.ops.relational.Scans.fixtureDir(dir, "stream_cdf_out")
    val ckpt = graft.ops.relational.Scans.fixtureDir(dir, "stream_cdf_ck")
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(outDir, ckpt).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      Tables.table(spark, dir, "customer").select(
        $"c_custkey",
        round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
        $"c_mktsegment".as("seg")).coalesce(1)
    }
    // per-trigger + mid-stream-merge shuffles sized to the fixture's
    // bucket count (the q_cdc_stream_agg discipline, r19 — see
    // qCdcStreamApply); the CDF feed and the applied end state are
    // partitioning-invariant, oracle hash untouched
    graft.ConfScope.withShufflePartitions(spark, 4) {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "snapshot")
        .load(path)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable() // snapshot batch drained
        graft.ops.cdc.PartitionedUpsert.merge(spark, path,
          changeSet(spark, dir), "c_custkey", "__lsn", "__op",
          Seq("bal_cents", "seg"), 4): Unit
        q.processAllAvailable() // tail batch drained
      } finally q.stop()
    }
    spark.read.parquet(outDir)
      .select($"c_custkey", $"change_type", $"bal_cents", $"seg")
      .orderBy($"c_custkey", $"change_type")
  }

  /** The maintained-aggregate sink under the hash gate (r18 verdict
    * #7 — the CDC-automation capstone): ONE continuous query
    * ([[CdcStream.maintainedAggregateSink]]) keeps BOTH the replica
    * and a derived per-segment aggregate current — each micro-batch
    * merges into the target, then AggMaintain consumes exactly the
    * CDF window that merge created (never recomputing the source).
    * The key's result is the final AGGREGATE state, a pure function
    * of the bounded input, so DuckDB replays it algebraically (the
    * q_cdc_stream_apply FULL OUTER JOIN replay, then GROUP BY seg)
    * and one hash certifies the sink composition: per-epoch merge
    * cursors, the CDF window hand-off, delta maintenance over
    * inserts/updates/deletes, and the aggregate's own txn-guarded
    * upsert. Change-set lsns are the REMAPPED KEYS (unique per row —
    * the maintained sinks dedup on lsn, so a constant lsn would
    * collapse the batch; per-key LWW is unaffected since each key
    * changes once). Two epochs split BY KEY keep the final state
    * trigger-order-invariant. Fixture: target pristine-restored,
    * aggregate + checkpoint reset per rep (the aggregate is DERIVED
    * state seeded from the first epoch's committed version — a stale
    * one would mistake the restored table for already-applied). */
  def qCdcStreamAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "stream_agg")
    val inDir = graft.ops.relational.Scans.fixtureDir(dir, "stream_agg_in")
    val aggDir = graft.ops.relational.Scans.fixtureDir(dir, "stream_agg_agg")
    val ckBase = graft.ops.relational.Scans.fixtureDir(dir, "stream_agg_ck")
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(aggDir, ckBase).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    // the maintained sinks cursor the TARGET's merges under the
    // CHECKPOINT PATH as txn app id, and the pristine restore KEEPS
    // the txn map (exactly-once across restarts is its contract) — a
    // rep-stable checkpoint path would make every later rep's epochs
    // read as replays and merge nothing. A per-rep unique checkpoint
    // IS the fresh stream identity.
    val ckpt = s"$ckBase/${java.util.UUID.randomUUID.toString.take(8)}"
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      Tables.table(spark, dir, "customer").select(
        $"c_custkey",
        round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
        $"c_mktsegment".as("seg")).coalesce(1)
    }
    changeSet(spark, dir)
      .withColumn("__lsn", $"c_custkey") // unique per row — see scaladoc
      .repartition(2, $"c_custkey")
      .write.mode("overwrite").json(inDir)
    val sch = StructType(Seq(
      StructField("__op", StringType), StructField("__lsn", LongType),
      StructField("c_custkey", LongType), StructField("bal_cents", LongType),
      StructField("seg", StringType)))
    // the sink's replay guard (dropDuplicates on lsn) is STATEFUL: it
    // provisions one state store per shuffle partition per trigger,
    // and this 15k-row fixture under the bench session's 32 global
    // partitions paid 32 store opens/commits/snapshots per trigger
    // for nothing — size the stream to the fixture's bucket count
    // the way production sizes it to data volume (the end state is
    // partitioning-invariant, so the oracle hash is untouched)
    // scope held through the drain: the stream pins it for its
    // stateful dedup at start, and the foreachBatch merges read the
    // session conf at execution time (single-threaded invariant
    // documented once at graft.ConfScope)
    graft.ConfScope.withShufflePartitions(spark, 4) {
      val q = CdcStream.maintainedAggregateSink(
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").json(inDir),
        targetDir = path, aggDir = aggDir, checkpointDir = ckpt,
        keyCol = "c_custkey", lsnCol = "__lsn", opCol = "__op",
        valueCols = Seq("bal_cents", "seg"),
        groupCols = Seq("seg"), sumCols = Seq("bal_cents"),
        nBuckets = 4, aggBuckets = 2)
      try q.processAllAvailable() finally q.stop()
    }
    graft.ops.cdc.AggMaintain.readAggregate(spark, aggDir)
      .select($"seg", $"cnt", $"sum_bal_cents")
      .orderBy($"seg")
  }

  /** The shared deterministic change set both stream keys drive: the
    * q_scan_graft_dsv2 derivation — aggregated order balances, every
    * 97th custkey remapped to a ghost key (inserts), every 13th a
    * DELETE, seg 'FED'. */
  private def changeSet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100.0, 0).cast("long")).as("bal_cents"))
      .select(
        when($"o_custkey" % 13 === 0, lit("d")).otherwise(lit("u")).as("__op"),
        lit(1L).as("__lsn"),
        when($"o_custkey" % 97 === 0, $"o_custkey" + 100000000L)
          .otherwise($"o_custkey").as("c_custkey"),
        $"bal_cents",
        lit("FED").as("seg"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_stream_apply" -> (qCdcStreamApply _),
    "q_cdc_stream_cdf" -> (qCdcStreamCdf _),
    "q_cdc_stream_agg" -> (qCdcStreamAgg _)
  )

  val oracle: Map[String, String] = Map(
    // the q_scan_graft_dsv2 replay WITHOUT its read-side filter: the
    // key certifies the applied END STATE of the stream
    "q_cdc_stream_apply" ->
      """WITH src AS (
        |  SELECT o_custkey AS k,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |           AS bal_cents
        |  FROM orders GROUP BY 1),
        |chg AS (
        |  SELECT CASE WHEN k % 97 = 0 THEN k + 100000000 ELSE k END AS c_custkey,
        |         CASE WHEN k % 13 = 0 THEN 'd' ELSE 'u' END AS op,
        |         bal_cents
        |  FROM src),
        |tgt AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer)
        |SELECT COALESCE(c.c_custkey, t.c_custkey) AS c_custkey,
        |       CASE WHEN c.c_custkey IS NOT NULL THEN c.bal_cents
        |            ELSE t.bal_cents END AS bal_cents,
        |       CASE WHEN c.c_custkey IS NOT NULL THEN 'FED'
        |            ELSE t.seg END AS seg
        |FROM tgt t FULL OUTER JOIN chg c ON t.c_custkey = c.c_custkey
        |WHERE COALESCE(c.op, '') <> 'd'
        |ORDER BY c_custkey""".stripMargin,
    // the CDF feed replayed algebraically: snapshot-as-inserts, then
    // the change set classified against it (see qCdcStreamCdf's
    // scaladoc for why every branch is deterministic)
    "q_cdc_stream_cdf" ->
      """WITH src AS (
        |  SELECT o_custkey AS k,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |           AS bal_cents
        |  FROM orders GROUP BY 1),
        |chg AS (
        |  SELECT CASE WHEN k % 97 = 0 THEN k + 100000000 ELSE k END AS c_custkey,
        |         CASE WHEN k % 13 = 0 THEN 'd' ELSE 'u' END AS op,
        |         bal_cents
        |  FROM src),
        |tgt AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer),
        |snapshot_rows AS (
        |  SELECT c_custkey, 'insert' AS change_type, bal_cents, seg
        |  FROM tgt),
        |tail_rows AS (
        |  SELECT c.c_custkey,
        |         CASE WHEN c.op = 'd' THEN 'delete'
        |              WHEN t.c_custkey IS NOT NULL THEN 'update'
        |              ELSE 'insert' END AS change_type,
        |         CASE WHEN c.op = 'd' THEN CAST(NULL AS BIGINT)
        |              ELSE c.bal_cents END AS bal_cents,
        |         CASE WHEN c.op = 'd' THEN CAST(NULL AS VARCHAR)
        |              ELSE 'FED' END AS seg
        |  FROM chg c LEFT JOIN tgt t ON c.c_custkey = t.c_custkey
        |  WHERE NOT (c.op = 'd' AND t.c_custkey IS NULL))
        |SELECT * FROM snapshot_rows
        |UNION ALL SELECT * FROM tail_rows
        |ORDER BY c_custkey, change_type""".stripMargin,
    // the maintained aggregate = GROUP BY seg over the applied end
    // state (the q_cdc_stream_apply replay feeding an aggregate)
    "q_cdc_stream_agg" ->
      """WITH src AS (
        |  SELECT o_custkey AS k,
        |         CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |           AS bal_cents
        |  FROM orders GROUP BY 1),
        |chg AS (
        |  SELECT CASE WHEN k % 97 = 0 THEN k + 100000000 ELSE k END AS c_custkey,
        |         CASE WHEN k % 13 = 0 THEN 'd' ELSE 'u' END AS op,
        |         bal_cents
        |  FROM src),
        |tgt AS (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer),
        |final AS (
        |  SELECT COALESCE(c.c_custkey, t.c_custkey) AS c_custkey,
        |         CASE WHEN c.c_custkey IS NOT NULL THEN c.bal_cents
        |              ELSE t.bal_cents END AS bal_cents,
        |         CASE WHEN c.c_custkey IS NOT NULL THEN 'FED'
        |              ELSE t.seg END AS seg
        |  FROM tgt t FULL OUTER JOIN chg c ON t.c_custkey = c.c_custkey
        |  WHERE COALESCE(c.op, '') <> 'd')
        |SELECT seg, COUNT(*) AS cnt,
        |       CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
        |FROM final GROUP BY seg
        |ORDER BY seg""".stripMargin
  )
}
