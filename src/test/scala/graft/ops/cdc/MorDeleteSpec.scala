package graft.ops.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Merge-on-read DELETE (key tombstones — the deletion-vector rung):
  * `deleteMor` commits O(delete batch) sidecars instead of rewriting
  * matched buckets; every reader anti-joins them away; any bucket
  * rewrite (merge, compaction, purge) makes the deletes physical and
  * retires the sidecars. */
class MorDeleteSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mor_$tag").toString

  /** k 1..12, v = k*10, 4 hash buckets. */
  private def fixture(tag: String): String = {
    import spark.implicits._
    val dir = tmp(tag)
    PartitionedUpsert.init(
      (1L to 12L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
    dir
  }

  private def keysOf(df: DataFrame): Seq[Long] =
    df.select("k").collect().map(_.getLong(0)).sorted.toSeq

  private def keyFrame(ks: Long*): DataFrame = {
    import spark.implicits._
    ks.toDF("k")
  }

  test("deleteMor hides rows immediately, moves NO data path, and " +
      "time travel to the pre-delete version still sees them") {
    val dir = fixture("basic")
    val before = PartitionedUpsert.manifestOrFail(spark, dir)
    val touched = PartitionedUpsert.deleteMor(spark, dir, keyFrame(3L, 7L, 11L), "k")
    assert(touched.nonEmpty)
    val after = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(after.version == before.version + 1)
    // metadata-speed: the data bucket map is BYTE-identical — only
    // sidecars were added
    assert(after.buckets == before.buckets)
    assert(after.tombs.keySet == touched.toSet)
    assert(after.tombs.values.flatten.forall(_.bytes > 0L),
      "sidecar footprint recorded at write time (broadcast decision)")
    assert(keysOf(PartitionedUpsert.read(spark, dir)) ==
      (1L to 12L).filterNot(Set(3L, 7L, 11L)))
    // pre-delete version unharmed
    assert(keysOf(PartitionedUpsert.readVersion(spark, dir, before.version)) ==
      (1L to 12L))
    // plan shape: the sidecar side BROADCASTS under the footprint
    // threshold (recorded bytes, zero FS calls) — a shuffled anti-join
    // here would tax every read of a lightly-tombstoned 100 TB table
    val plan = PartitionedUpsert.read(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast left-anti tombstone join, got:\n$plan")
    // point-lookup and range reads flow through the same filter
    assert(keysOf(PartitionedUpsert.readForKeys(spark, dir, keyFrame(3L, 4L), "k"))
      .intersect(Seq(3L)).isEmpty)
    assert(keysOf(PartitionedUpsert.readKeyRange(spark, dir, 1L, 12L)) ==
      (1L to 12L).filterNot(Set(3L, 7L, 11L)))
  }

  test("stacked deletes union; deleting absent keys or replaying a " +
      "txn burns no version; null keys are dropped") {
    import spark.implicits._
    val dir = fixture("stack")
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(2L), "k",
      txn = Some("eraser" -> 1L))
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(5L), "k",
      txn = Some("eraser" -> 2L))
    assert(keysOf(PartitionedUpsert.read(spark, dir)) ==
      (1L to 12L).filterNot(Set(2L, 5L)))
    val v = PartitionedUpsert.manifestOrFail(spark, dir).version
    // replay: txn already applied — metadata no-op
    assert(PartitionedUpsert.deleteMor(spark, dir, keyFrame(5L), "k",
      txn = Some("eraser" -> 2L)).isEmpty)
    // absent keys route to buckets, but nothing to hide — the write
    // still commits (the sidecar records intent); keys routing to
    // buckets the table does not HAVE are dropped pre-commit
    assert(PartitionedUpsert.deleteMor(spark, dir,
      spark.range(1).selectExpr("CAST(NULL AS BIGINT) AS k"), "k").isEmpty,
      "an all-null key batch is a no-op")
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == v)
  }

  test("a merge touching a tombstoned bucket keeps the deletes, " +
      "retires that bucket's sidecars, and an upsert of a deleted " +
      "key resurrects it") {
    import spark.implicits._
    val dir = fixture("merge")
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(1L, 2L, 3L, 4L), "k")
    // upsert k=2 (deleted: must resurrect) and k=6 (live: must update)
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 2L, "u", 222L), (101L, 6L, "u", 666L))
        .toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4)
    val rows = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.get(2L).contains(222L), "upsert resurrects a deleted key")
    assert(rows.get(6L).contains(666L))
    assert(!rows.contains(1L) && !rows.contains(3L) && !rows.contains(4L),
      "deletes survive the rewrite of their buckets")
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val touched = Seq(2L, 6L).map(k =>
      spark.range(1).select(
        PartitionedUpsert.routeFor(m, org.apache.spark.sql.functions.lit(k))
          .as("b")).head().getLong(0)).toSet
    assert(m.tombs.keySet.intersect(touched).isEmpty,
      "a rewritten bucket's sidecars retire with the rewrite")
  }

  test("changesBetween surfaces MOR deletes as delete rows even " +
      "though no data path moved") {
    val dir = fixture("cdf")
    val v1 = PartitionedUpsert.manifestOrFail(spark, dir).version
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(4L, 9L), "k")
    val v2 = PartitionedUpsert.manifestOrFail(spark, dir).version
    val feed = PartitionedUpsert.changesBetween(spark, dir, v1, v2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(feed == Seq((4L, "delete"), (9L, "delete")))
  }

  test("purgeTombstones rewrites only tombstoned buckets, results " +
      "identical, debt zero; a fully-tombstoned bucket leaves the " +
      "map; vacuum keeps referenced sidecars alive") {
    val dir = fixture("purge")
    val mBefore = PartitionedUpsert.manifestOrFail(spark, dir)
    // fully tombstone one bucket: find every key in some bucket b0
    val byBucket = (1L to 12L).groupBy(k =>
      spark.range(1).select(
        PartitionedUpsert.routeFor(mBefore, org.apache.spark.sql.functions.lit(k))
          .as("b")).head().getLong(0))
    val (b0, b0Keys) = byBucket.head
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(b0Keys: _*), "k")
    val expect = keysOf(PartitionedUpsert.read(spark, dir))
    val purged = PartitionedUpsert.purgeTombstones(spark, dir)
    assert(purged == Seq(b0))
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.tombs.isEmpty)
    assert(!m.buckets.contains(b0),
      "a bucket emptied by its tombstones drops from the map")
    assert(keysOf(PartitionedUpsert.read(spark, dir)) == expect)
    // untombstoned buckets kept their ORIGINAL paths (purge is
    // O(tombstoned buckets), not O(table))
    (mBefore.buckets - b0).foreach { case (b, rel) =>
      assert(m.buckets.get(b).contains(rel)) }
    assert(PartitionedUpsert.purgeTombstones(spark, dir).isEmpty,
      "no debt: no version burned")
    // vacuum with everything retained: reads stay correct
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1,
      minStagingAgeMs = 0L)
    assert(keysOf(PartitionedUpsert.read(spark, dir)) == expect)
  }

  test("vacuum never reclaims a sidecar referenced by a kept " +
      "manifest (tombstoned reads survive aggressive vacuum)") {
    val dir = fixture("vacuum")
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(1L, 12L), "k")
    val expect = keysOf(PartitionedUpsert.read(spark, dir))
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1,
      minStagingAgeMs = 0L)
    assert(keysOf(PartitionedUpsert.read(spark, dir)) == expect,
      "the sidecar staging dir is reachable and must survive")
  }

  test("tombstoned buckets drop their lsn watermark to None — an " +
      "lsn-addressed consumer re-reads instead of skipping deletes") {
    val dir = fixture("lsn")
    // merge once so buckets carry real watermarks
    import spark.implicits._
    PartitionedUpsert.merge(spark, dir,
      Seq((50L, 1L, "u", 111L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4)
    val touched = PartitionedUpsert.deleteMor(spark, dir, keyFrame(1L), "k")
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    touched.foreach { b =>
      assert(m.stats.get(b).forall(_.maxLsn.isEmpty)) }
    assert(PartitionedUpsert.bucketsChangedSince(spark, dir, 50L)
      .toSet.intersect(touched.toSet) == touched.toSet,
      "conservative include: the tombstoned bucket must be re-read")
  }

  test("DSv2 face applies tombstones: format(\"graft\") load, a " +
      "pruned projection WITHOUT the key, and count(*) all exclude " +
      "deleted rows") {
    val dir = fixture("dsv2")
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(2L, 8L), "k")
    val df = spark.read.format("graft").load(dir)
    assert(keysOf(df) == (1L to 12L).filterNot(Set(2L, 8L)))
    // projection that prunes the key away still filters correctly
    assert(df.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 12L).filterNot(Set(2L, 8L)).map(_ * 10L))
    assert(df.count() == 10L)
    // pushed point filter on a deleted key: empty
    assert(df.filter(org.apache.spark.sql.functions.col("k") === 2L).count() == 0L)
    // time travel through the DSv2 option
    val v1 = 1L
    assert(spark.read.format("graft").option("versionAsOf", v1)
      .load(dir).count() == 12L)
  }

  test("REORG TABLE … APPLY (PURGE) through the injected parser " +
      "purges tombstones on a catalog graft table; malformed REORG " +
      "fails with the graft error") {
    val dir = fixture("reorg")
    PartitionedUpsert.deleteMor(spark, dir, keyFrame(6L, 10L), "k")
    val expect = keysOf(PartitionedUpsert.read(spark, dir))
    val tbl = s"graft_mor_reorg_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      val purged = spark.sql(s"REORG TABLE $tbl APPLY (PURGE)")
        .head().getLong(0)
      assert(purged > 0L)
      val m = PartitionedUpsert.manifestOrFail(spark, dir)
      assert(m.tombs.isEmpty)
      assert(keysOf(PartitionedUpsert.read(spark, dir)) == expect)
      // debt-free replay: no version burn, receipt 0
      assert(spark.sql(s"REORG TABLE $tbl APPLY (PURGE)")
        .head().getLong(0) == 0L)
      val e = intercept[Exception] {
        spark.sql(s"REORG TABLE $tbl APPLY (COMPACT)")
      }
      assert(e.getMessage.toLowerCase.contains("purge"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("guards: wrong key column and mismatched key type are " +
      "rejected loudly") {
    import spark.implicits._
    val dir = fixture("guards")
    val e1 = intercept[IllegalArgumentException] {
      PartitionedUpsert.deleteMor(spark, dir, keyFrame(1L).toDF("k"), "v")
    }
    assert(e1.getMessage.contains("keyed by"))
    val e2 = intercept[IllegalArgumentException] {
      PartitionedUpsert.deleteMor(spark, dir,
        Seq(1).toDF("k"), "k") // Int vs Long key
    }
    assert(e2.getMessage.contains("does not match"))
  }
}
