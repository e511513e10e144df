package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracled merge-on-read DELETE lifecycle — the deletion-vector rung
  * under the cross-engine hash gate. */
object MorQueries {

  /** Tombstone-delete lifecycle certified cross-engine: an upsert
    * table is initialized from customer (cents grid), then
    *   1. [[PartitionedUpsert.deleteMor]] tombstones every negative-
    *      balance custkey — O(delete batch) sidecar commit, NO bucket
    *      rewrite (the GDPR-sweep shape at 100 TB),
    *   2. a `merge` upserts the every-100th custkeys to seg 'VIP' —
    *      rewriting THEIR buckets through the tombstone-filtered
    *      read (deletes become physical there, sidecars retire) and
    *      RESURRECTING deleted keys the batch re-inserts,
    *   3. the read-back anti-joins the surviving sidecars of the
    *      untouched buckets.
    * DuckDB replays algebraically (WHERE-out the deletes except the
    * re-inserted slice, CASE the VIP flip), so one hash certifies the
    * sidecar write, the anti-join read, the rewrite interplay, and
    * resurrection semantics together. Fixture prepared once per
    * (session, sf) and rolled back to pristine v1 per rep
    * ([[LifecycleFixture]] — metadata-only restore), at the
    * lifecycle-slim shape (4 buckets, single-file init — the
    * q_cdc_dml_sql discipline). */
  def qCdcDeleteMor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = graft.ops.relational.Scans.fixtureDir(dir, "delete_mor")
    val tgt = Tables.table(spark, dir, "customer").select(
      $"c_custkey",
      round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
      $"c_mktsegment".as("seg"))
    // pristine-restore fixture discipline (r16 verdict #3 — see
    // LifecycleFixture): warm reps skip the init write entirely
    LifecycleFixture.pristine(spark, path, "c_custkey", nBuckets = 4) {
      tgt.coalesce(1)
    }
    PartitionedUpsert.deleteMor(spark, path,
      tgt.filter($"bal_cents" < 0).select($"c_custkey"), "c_custkey")
    PartitionedUpsert.merge(spark, path,
      tgt.filter($"c_custkey" % 100 === 0).select(
        lit(1L).as("lsn"), lit("u").as("op"),
        $"c_custkey", $"bal_cents", lit("VIP").as("seg")),
      "c_custkey", "lsn", "op", Seq("bal_cents", "seg"), nBuckets = 4)
    PartitionedUpsert.read(spark, path)
      .select($"c_custkey", $"bal_cents", $"seg")
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_delete_mor" -> (qCdcDeleteMor _)
  )

  val oracle: Map[String, String] = Map(
    // survivors = non-negative balances, plus the every-100th slice
    // (resurrected by the upsert if deleted); that slice reads 'VIP'
    "q_cdc_delete_mor" ->
      """SELECT c_custkey,
        |       CAST(ROUND(c_acctbal*100,0) AS BIGINT) AS bal_cents,
        |       CASE WHEN c_custkey % 100 = 0 THEN 'VIP'
        |            ELSE c_mktsegment END AS seg
        |FROM customer
        |WHERE CAST(ROUND(c_acctbal*100,0) AS BIGINT) >= 0
        |   OR c_custkey % 100 = 0
        |ORDER BY c_custkey""".stripMargin
  )
}
