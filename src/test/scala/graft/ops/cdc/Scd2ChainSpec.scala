package graft.ops.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The key-routed version-chain table: chainAsOf lookups equal the
  * history-window derivation for every coverage class (current, late,
  * pre-first-version, unknown key), appends stay O(batch)-shaped and
  * in-order, and truncation honors its horizon contract. */
class Scd2ChainSpec extends SparkSpec {

  private def dimBatch(rows: Seq[(Long, Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "lsn", "ts", "price")
  }

  /** Reference: version in force from the (independently maintained)
    * history table, via the window derivation. */
  private def historyAsOf(hDir: String, events: DataFrame): Seq[(Long, Option[Double], Option[Long], Option[Long])] = {
    import spark.implicits._
    val hist = Scd2Maintain.readHistory(spark, hDir)
      .select($"pk", $"lsn".as("h_lsn"), $"valid_from".as("h_from"),
        $"price".as("h_price"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id").orderBy($"h_from".desc, $"h_lsn".desc)
    events.join(hist, events("pk") === hist("pk") && $"ts" >= $"h_from", "left")
      .drop(hist("pk"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"h_price", $"h_lsn", $"h_from")
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Double](1)).map(_.doubleValue),
        Option(r.getAs[java.lang.Long](2)).map(_.longValue),
        Option(r.getAs[java.lang.Long](3)).map(_.longValue)))
      .sortBy(_._1).toSeq
  }

  private def chainRows(cDir: String, events: DataFrame) =
    Scd2Maintain.chainAsOf(spark, cDir, events, "pk", "ts", Seq("price"))
      .select(col("event_id"), col("dim_price"), col("dim_lsn"),
        col("dim_valid_from"))
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Double](1)).map(_.doubleValue),
        Option(r.getAs[java.lang.Long](2)).map(_.longValue),
        Option(r.getAs[java.lang.Long](3)).map(_.longValue)))
      .sortBy(_._1).toSeq

  test("chainAsOf equals the history-window lookup across waves, for " +
      "current, late, pre-first and unknown keys") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_chain").toString
    val (hDir, oDir, cDir) = (s"$base/hist", s"$base/open", s"$base/chain")
    val w1 = Seq((1L, 1L, 100L, 10.0), (2L, 2L, 120L, 20.0))
    val w2 = Seq((1L, 3L, 200L, 11.0), (1L, 4L, 300L, 12.0))
    Scd2Maintain.init(dimBatch(w1), hDir, oDir, "pk", "lsn", "ts",
      Seq("price"), nBuckets = 4)
    Scd2Maintain.initChain(dimBatch(w1), cDir, "pk", "lsn", "ts",
      Seq("price"), nBuckets = 4)
    Seq(w1, w2).foreach { w =>
      Scd2Maintain.applyBatch(spark, hDir, oDir, dimBatch(w), "pk", "lsn",
        "ts", Seq("price"), nBuckets = 4)
      Scd2Maintain.applyBatchChain(spark, cDir, dimBatch(w), "pk", "lsn",
        "ts", Seq("price"), nBuckets = 4)
    }
    val events = Seq(
      (100L, 1L, 350L), // current version (v 300)
      (101L, 1L, 250L), // late: version at 200
      (102L, 1L, 150L), // later still: version at 100
      (103L, 1L, 50L),  // pre-first: null dims
      (104L, 2L, 500L), // other key's current
      (105L, 9L, 500L)  // unknown key: null dims
    ).toDF("event_id", "pk", "ts")
    assert(chainRows(cDir, events) === historyAsOf(hDir, events))
    // chain stays version-sorted per key (the in-order append contract)
    val chain1 = PartitionedUpsert.read(spark, cDir)
      .filter($"pk" === 1L).select($"versions").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(chain1.map(_.getLong(1)) === Seq(100L, 200L, 300L))
    // replayed chain append under the same txn is a metadata no-op
    val w3 = Seq((2L, 5L, 600L, 21.0))
    val before = PartitionedUpsert.currentManifest(spark, cDir).get.version
    val n = Scd2Maintain.applyBatchChain(spark, cDir, dimBatch(w3), "pk",
      "lsn", "ts", Seq("price"), nBuckets = 4, txn = Some(("app", 1L)))
    Scd2Maintain.applyBatchChain(spark, cDir, dimBatch(w3), "pk",
      "lsn", "ts", Seq("price"), nBuckets = 4, txn = Some(("app", 1L))): Unit
    val after = PartitionedUpsert.currentManifest(spark, cDir).get.version
    assert(after === before + 1,
      s"first txn append commits once, replay no-ops (wrote $n)")
    val chain2 = PartitionedUpsert.read(spark, cDir)
      .filter($"pk" === 2L).select($"versions").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(chain2.map(_.getLong(1)) === Seq(120L, 600L),
      "replay must not double-append the wave")
  }

  test("truncateChains: superseded pre-horizon versions go, the one in " +
      "force at the horizon stays, post-horizon lookups are unchanged, " +
      "and the sweep is idempotent") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_chtr").toString
    val cDir = s"$base/chain"
    val vs = Seq((1L, 1L, 100L, 10.0), (1L, 2L, 200L, 11.0),
      (1L, 3L, 300L, 12.0), (2L, 4L, 400L, 20.0))
    Scd2Maintain.initChain(dimBatch(vs), cDir, "pk", "lsn", "ts",
      Seq("price"), nBuckets = 4)
    Scd2Maintain.applyBatchChain(spark, cDir, dimBatch(vs), "pk", "lsn",
      "ts", Seq("price"), nBuckets = 4)
    val events = Seq((1L, 1L, 260L), (2L, 1L, 310L), (3L, 2L, 450L))
      .toDF("event_id", "pk", "ts")
    val preTrunc = chainRows(cDir, events)
    // horizon 250: pk=1's version at 100 is superseded before it (by
    // 200) and goes; the version at 200 is IN FORCE at 250 and stays
    assert(Scd2Maintain.truncateChains(spark, cDir, "ts", horizon = 250L,
      nBuckets = 4) === 1L)
    val chain1 = PartitionedUpsert.read(spark, cDir)
      .filter($"pk" === 1L).select($"versions").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(chain1.map(_.getLong(1)) === Seq(200L, 300L),
      "keep the horizon-covering version and everything after")
    assert(chainRows(cDir, events) === preTrunc,
      "post-horizon lookups must be unchanged by the sweep")
    assert(Scd2Maintain.truncateChains(spark, cDir, "ts", horizon = 250L,
      nBuckets = 4) === 0L, "idempotent under the same horizon")
  }
}
