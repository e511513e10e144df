package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DESCRIBE HISTORY analog: per-version audit rows from manifest
  * metadata alone — versions newest-first, changed-bucket diffs vs
  * the previous surviving version, txn cursors, footprint sums. */
class HistorySpec extends SparkSpec {

  test("history: one row per version, newest first, changed_buckets " +
      "diffs manifests, txns and max_lsn surface") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val snap = (1L to 40L).map(k => (k, k * 10L)).toDF("k", "v")
    PartitionedUpsert.init(snap, dir, "k", nBuckets = 8)
    // v2: touch a couple of buckets with a txn cursor
    PartitionedUpsert.merge(spark, dir,
      Seq(("u", 5L, 1L, 111L), ("u", 5L, 2L, 222L))
        .toDF("__op", "__lsn", "k", "v"),
      "k", "__lsn", "__op", Seq("v"), 8, txn = Some(("hist-app", 7L)))
    val h = PartitionedUpsert.historyDf(spark, dir)
    assert(h.columns.toSeq === Seq("version", "commit_time_ms", "n_buckets",
      "layout", "key_col", "changed_buckets", "files", "bytes", "max_lsn",
      "txns"))
    val rows = h.orderBy(col("version").desc).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 1L))
    val v2 = rows(0); val v1 = rows(1)
    // v2 rewrote only the buckets keys 1,2 route to (<= 2 of 8)
    assert(v2.getAs[Int]("changed_buckets") >= 1 &&
      v2.getAs[Int]("changed_buckets") <= 2, v2.toString)
    // oldest surviving version: everything counts as new
    assert(v1.getAs[Int]("changed_buckets") === 8)
    assert(v2.getAs[String]("txns") === "hist-app=7")
    assert(v2.getAs[Long]("max_lsn") === 5L)
    assert(v2.getAs[Long]("bytes") >= 0L && v2.getAs[Long]("files") >= 1L)
    assert(v2.getAs[Long]("commit_time_ms") > 0L)
    // metadata-only: works after data-dir listing would be expensive —
    // and survives vacuum trimming (the oldest row simply drops)
    PartitionedUpsert.merge(spark, dir,
      Seq(("u", 9L, 3L, 333L)).toDF("__op", "__lsn", "k", "v"),
      "k", "__lsn", "__op", Seq("v"), 8)
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 2,
      minStagingAgeMs = 0L)
    val after = PartitionedUpsert.historyDf(spark, dir)
      .select("version").collect().map(_.getLong(0)).toSeq
    assert(after === Seq(3L, 2L))
  }
}
