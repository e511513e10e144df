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
    val changes = Tables.table(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100.0, 0).cast("long")).as("bal_cents"))
      .select(
        when($"o_custkey" % 13 === 0, lit("d")).otherwise(lit("u")).as("__op"),
        lit(1L).as("__lsn"),
        when($"o_custkey" % 97 === 0, $"o_custkey" + 100000000L)
          .otherwise($"o_custkey").as("c_custkey"),
        $"bal_cents",
        lit("FED").as("seg"))
    // two epochs, split BY KEY (order-invariant final state); a plain
    // distributed write — no driver materialization of the change set
    changes.repartition(2, $"c_custkey")
      .write.mode("overwrite").json(inDir)
    val sch = StructType(Seq(
      StructField("__op", StringType), StructField("__lsn", LongType),
      StructField("c_custkey", LongType), StructField("bal_cents", LongType),
      StructField("seg", StringType)))
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").json(inDir)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("opCol", "__op").option("lsnCol", "__lsn")
      .start(path)
    try q.processAllAvailable() finally q.stop()
    spark.read.format("graft").load(path)
      .select($"c_custkey", $"bal_cents", $"seg")
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_stream_apply" -> (qCdcStreamApply _)
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
        |ORDER BY c_custkey""".stripMargin
  )
}
