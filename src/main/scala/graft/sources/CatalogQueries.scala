package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The catalog face under the CROSS-ENGINE HASH GATE (r17): one key
  * drives name-addressed SQL end to end — atomic RTAS (a
  * StagingTableCatalog commit), the injected UPDATE/DELETE grammar
  * resolving a CATALOG name, and the read back through the catalog —
  * so the hash certifies identifier→directory resolution, the staged
  * write, the one-manifest-swap replace, and the DML lowerings
  * together. DuckDB replays the lifecycle algebraically. */
object CatalogQueries {

  /** Catalog lifecycle certified cross-engine:
    *   1. `CREATE OR REPLACE TABLE cat.bench.acct … AS SELECT` the
    *      customer cents grid (atomic staged CTAS/RTAS — first rep
    *      creates, warm reps replace, SAME result by construction),
    *   2. `UPDATE … SET bal_cents += 12345 WHERE seg = 'BUILDING'`,
    *   3. `DELETE FROM … WHERE bal_cents < 0`,
    *   4. read back through the catalog name, ordered.
    * The catalog instance is registered once per (session, sf) under
    * an sf-hashed name (a catalog pins ONE warehouse at first use;
    * two sfs in one session must not share it). RTAS-per-rep is the
    * measured lifecycle — the staged write IS the feature under
    * test, so no pristine-restore shortcut applies. */
  def qCdcCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wh = graft.ops.relational.Scans.fixtureDir(dir, "catalog_wh")
    val cat = s"gbench_${math.abs(wh.hashCode).toString}"
    if (!spark.conf.getOption(s"spark.sql.catalog.$cat").isDefined) {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.bench")
    Tables.table(spark, dir, "customer").select(
      $"c_custkey",
      round($"c_acctbal" * 100.0, 0).cast("long").as("bal_cents"),
      $"c_mktsegment".as("seg"))
      .createOrReplaceTempView("graft_catalog_src")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.bench.acct USING graft " +
      "TBLPROPERTIES ('key'='c_custkey','buckets'='4') " +
      "AS SELECT * FROM graft_catalog_src")
    spark.sql(s"UPDATE $cat.bench.acct SET bal_cents = bal_cents + 12345 " +
      "WHERE seg = 'BUILDING'")
    spark.sql(s"DELETE FROM $cat.bench.acct WHERE bal_cents < 0")
    spark.sql(s"SELECT c_custkey, bal_cents, seg FROM $cat.bench.acct " +
      "ORDER BY c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_catalog" -> (qCdcCatalog _)
  )

  val oracle: Map[String, String] = Map(
    // RTAS + UPDATE + DELETE replayed algebraically: CASE the bump,
    // WHERE-out the post-bump negatives
    "q_cdc_catalog" ->
      """SELECT c_custkey, bal_cents, seg FROM (
        |  SELECT c_custkey,
        |         CAST(ROUND(c_acctbal*100,0) AS BIGINT) +
        |           CASE WHEN c_mktsegment = 'BUILDING' THEN 12345
        |                ELSE 0 END AS bal_cents,
        |         c_mktsegment AS seg
        |  FROM customer)
        |WHERE bal_cents >= 0
        |ORDER BY c_custkey""".stripMargin
  )
}
