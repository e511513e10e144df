package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-micro-batch SCD2 upkeep must converge to exactly the history
  * the batch derivation (Cdc.scd2) computes from the concatenated
  * log — through multi-event batches, keys spanning batches, a crash
  * between the history and open-table merges, and full replays. */
class Scd2MaintainSpec extends SparkSpec {

  private val V = Seq("op", "v")

  // (pk, lsn, ts, op, v) — lsn monotonic, ts monotonic per key;
  // pk 1 evolves across all three batches, pk 2 twice inside one
  // batch, pk 3 appears once, pk 4 arrives only in the last batch
  private val log = Seq(
    (1L, 10L, 100L, "c", 1.0),
    (2L, 11L, 110L, "c", 2.0),
    (3L, 12L, 120L, "c", 3.0),
    // batch 2
    (1L, 20L, 200L, "u", 1.5),
    (2L, 21L, 210L, "u", 2.5),
    (2L, 22L, 220L, "u", 2.7),
    // batch 3
    (1L, 30L, 300L, "d", 0.0),
    (4L, 31L, 310L, "c", 4.0))

  private def df(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("pk", "lsn", "ts", "op", "v")
  }

  private def collectHist(d: org.apache.spark.sql.DataFrame) = d.collect()
    .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("lsn"),
      r.getAs[Long]("ts"), r.getAs[String]("op"), r.getAs[Double]("v"),
      r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to"))
        .map(_.longValue), r.getAs[Boolean]("is_current")))
    .sortBy(t => (t._1, t._2)).toSeq

  private def reference(upTo: Int) =
    collectHist(Cdc.scd2(df(log.take(upTo)), Seq("pk"), "lsn", "ts"))

  test("multi-batch upkeep equals the batch-derived history after " +
      "every batch; a crash between merges heals on replay") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2m").toString
    val (hDir, oDir) = (s"$base/hist", s"$base/open")
    val b1 = df(log.take(3)); val b2 = df(log.slice(3, 6)); val b3 = df(log.drop(6))
    Scd2Maintain.init(b1, hDir, oDir, "pk", "lsn", "ts", V, nBuckets = 4)

    Scd2Maintain.applyBatch(spark, hDir, oDir, b1, "pk", "lsn", "ts", V, 4,
      txn = Some(("scd2", 1L)))
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) === reference(3))

    // batch 2 crashes BETWEEN the history merge and the open merge
    intercept[RuntimeException] {
      Scd2Maintain.applyBatchWithFailpoint(spark, hDir, oDir, b2,
        "pk", "lsn", "ts", V, 4, txn = Some(("scd2", 2L)),
        crashAfterHistory = true)
    }
    // replay the SAME batch: the history merge is recognized as applied
    // (txn), the open merge completes — no duplicates, no lost close
    Scd2Maintain.applyBatch(spark, hDir, oDir, b2, "pk", "lsn", "ts", V, 4,
      txn = Some(("scd2", 2L)))
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) === reference(6))

    Scd2Maintain.applyBatch(spark, hDir, oDir, b3, "pk", "lsn", "ts", V, 4,
      txn = Some(("scd2", 3L)))
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) === reference(8))

    // a full replay of a committed batch is a metadata no-op
    val vH = PartitionedUpsert.currentManifest(spark, hDir).get.version
    val vO = PartitionedUpsert.currentManifest(spark, oDir).get.version
    assert(Scd2Maintain.applyBatch(spark, hDir, oDir, b3,
      "pk", "lsn", "ts", V, 4, txn = Some(("scd2", 3L))) === 0L)
    assert(PartitionedUpsert.currentManifest(spark, hDir).get.version === vH)
    assert(PartitionedUpsert.currentManifest(spark, oDir).get.version === vO)
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) === reference(8))

    // exactly one open version per key, and it is the log's last
    val cur = Scd2Maintain.readHistory(spark, hDir)
      .filter(col("is_current")).collect()
    assert(cur.map(_.getAs[Long]("pk")).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    assert(cur.map(r => r.getAs[Long]("pk") -> r.getAs[Long]("lsn")).toMap ===
      Map(1L -> 30L, 2L -> 22L, 3L -> 12L, 4L -> 31L))
  }

  test("init is idempotent per target: a crash between the two inits " +
      "heals by calling init again") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2i").toString
    val (hDir, oDir) = (s"$base/hist", s"$base/open")
    val b1 = df(log.take(3))
    Scd2Maintain.init(b1, hDir, oDir, "pk", "lsn", "ts", V, nBuckets = 4)
    // replayed init (the streaming sink's lazy-init path) must not throw
    Scd2Maintain.init(b1, hDir, oDir, "pk", "lsn", "ts", V, nBuckets = 4)
    Scd2Maintain.applyBatch(spark, hDir, oDir, b1, "pk", "lsn", "ts", V, 4)
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) === reference(3))
  }

  test("empty batch is a no-op; per-batch cost reads only the batch " +
      "keys' open buckets") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2e").toString
    val (hDir, oDir) = (s"$base/hist", s"$base/open")
    val b1 = df(log.take(3))
    Scd2Maintain.init(b1, hDir, oDir, "pk", "lsn", "ts", V, nBuckets = 8)
    Scd2Maintain.applyBatch(spark, hDir, oDir, b1, "pk", "lsn", "ts", V, 8)
    val vH = PartitionedUpsert.currentManifest(spark, hDir).get.version
    assert(Scd2Maintain.applyBatch(spark, hDir, oDir, b1.limit(0),
      "pk", "lsn", "ts", V, 8) === 0L)
    assert(PartitionedUpsert.currentManifest(spark, hDir).get.version === vH,
      "an empty batch must not burn a table version")
    // the open-interval lookup for a 1-key batch reads at most 1 bucket
    val keys = df(log.take(1)).select(col("pk")).distinct()
    val probe = PartitionedUpsert.readForKeys(spark, oDir, keys, "pk")
    val bucketDirs = probe.inputFiles
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(bucketDirs.length <= 1,
      s"1-key open lookup must read <= 1 bucket, got ${bucketDirs.toSeq}")
  }
}
