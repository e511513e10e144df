package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-bucket data-skipping stats recorded in the manifest at write
  * time: physical footprint without FS listings, key-range pruning for
  * sparse ranges, and lsn-watermark pruning for incremental consumers. */
class ManifestStatsSpec extends SparkSpec {

  private def mkTarget(dir: String, n: Long = 100L, nBuckets: Int = 8): Unit = {
    import spark.implicits._
    val snap = (0L until n).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets)
  }

  private def dirsTouched(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct.toSeq

  test("write paths record files/bytes/minKey/maxKey/maxLsn; init " +
      "buckets carry the untouched-since-init watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms").toString + "/t"
    mkTarget(dir)
    val atInit = PartitionedUpsert.bucketStats(spark, dir).toMap
    assert(atInit.nonEmpty)
    assert(atInit.values.forall(s => s.files >= 1 && s.bytes > 0))
    assert(atInit.values.forall(_.maxLsn.contains(Long.MinValue)))
    assert(atInit.values.forall(s => s.minKey.isDefined && s.maxKey.isDefined))
    // ranges cover the data: global min/max across buckets = 0 / 99
    assert(atInit.values.flatMap(_.minKey).min === 0L)
    assert(atInit.values.flatMap(_.maxKey).max === 99L)

    val touched = PartitionedUpsert.merge(spark, dir,
      Seq((100L, 7L, "u", -7.0), (101L, 8L, "u", -8.0))
        .toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    val after = PartitionedUpsert.bucketStats(spark, dir).toMap
    // each touched bucket carries the max lsn IT received (keys 7 and 8
    // may hash apart); the ceiling across touched buckets is the batch max
    touched.foreach(b => assert(
      after(b).maxLsn.exists(l => l == 100L || l == 101L),
      s"merged bucket $b must carry a ceiling from this batch, got ${after(b)}"))
    assert(touched.flatMap(b => after(b).maxLsn).max === 101L)
    after.keySet.diff(touched.toSet).foreach(b =>
      assert(after(b).maxLsn.contains(Long.MinValue),
        s"untouched bucket $b must keep its init watermark"))
    // stats() is now manifest-backed and agrees with the full view
    val flat = PartitionedUpsert.stats(spark, dir)
      .map { case (b, f, by) => b -> ((f, by)) }.toMap
    assert(flat === after.map { case (b, s) => b -> ((s.files, s.bytes)) })
  }

  test("readKeyRange prunes to the buckets holding a sparse key range, " +
      "results identical to the unpruned scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_kr").toString + "/t"
    mkTarget(dir) // keys 0..99 across all 8 buckets
    // three outlier keys land in at most 3 buckets
    PartitionedUpsert.merge(spark, dir,
      Seq((200L, 1000L, "c", 1.0), (201L, 1001L, "c", 2.0),
        (202L, 1002L, "c", 3.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    val ranged = PartitionedUpsert.readKeyRange(spark, dir, 1000L, 2000L)
    assert(dirsTouched(ranged).length <= 3,
      s"3 outlier keys must prune to <= 3 buckets, touched ${dirsTouched(ranged)}")
    val expected = PartitionedUpsert.read(spark, dir)
      .filter($"pk" >= 1000L && $"pk" <= 2000L)
    assert(ranged.collect().map(_.getLong(0)).sorted.toSeq ===
      expected.collect().map(_.getLong(0)).sorted.toSeq)
    assert(ranged.count() === 3)
  }

  test("changesSinceLsn skips buckets whose watermark is below the " +
      "cutoff — manifest-only, zero reads for untouched buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_cs").toString + "/t"
    mkTarget(dir)
    // nothing changed since init: candidate set is EMPTY at any cutoff
    assert(PartitionedUpsert.bucketsChangedSince(spark, dir, 0L).isEmpty)
    assert(PartitionedUpsert.changesSinceLsn(spark, dir, 0L).isEmpty)
    val touched = PartitionedUpsert.merge(spark, dir,
      Seq((100L, 3L, "u", -3.0), (105L, 4L, "u", -4.0))
        .toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    assert(PartitionedUpsert.bucketsChangedSince(spark, dir, 50L).sorted
      === touched.sorted)
    // the candidate rows include every merged key
    val rows = PartitionedUpsert.changesSinceLsn(spark, dir, 50L)
      .select("pk").collect().map(_.getLong(0)).toSet
    assert(Set(3L, 4L).subsetOf(rows))
    // cutoff above the ceiling: empty again
    assert(PartitionedUpsert.bucketsChangedSince(spark, dir, 105L).isEmpty)
    // cutoff mid-batch: lsn 100 <= 104 < 105 — only bucket(s) whose
    // ceiling exceeds the cutoff remain
    val mid = PartitionedUpsert.bucketsChangedSince(spark, dir, 104L)
    assert(mid.nonEmpty && mid.toSet.subsetOf(touched.toSet))
  }

  test("a touched bucket whose batch lsn ceiling is unknown (all-null " +
      "lsn) falls back to the conservative-include watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_nl").toString + "/t"
    mkTarget(dir)
    // establish a real prior watermark on key 7's bucket
    val t1 = PartitionedUpsert.merge(spark, dir,
      Seq((100L, 7L, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    // then touch the SAME key with a null-lsn batch: the stale prior
    // Some(100) must NOT stand — changesSinceLsn(100) would skip a
    // bucket this batch just changed
    val t2 = PartitionedUpsert.merge(spark, dir,
      Seq((null.asInstanceOf[java.lang.Long], 7L, "u", -77.0))
        .toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    assert(t1 === t2)
    val st = PartitionedUpsert.bucketStats(spark, dir).toMap
    t2.foreach(b => assert(st(b).maxLsn.isEmpty,
      s"bucket $b ceiling must be unknown after a null-lsn touch, got ${st(b)}"))
    // conservative include: the bucket stays a candidate at ANY cutoff
    assert(t2.toSet.subsetOf(
      PartitionedUpsert.bucketsChangedSince(spark, dir, Long.MaxValue - 1).toSet))
  }

  test("widening the KEY column rehashes buckets — watermarks fall back " +
      "to the global ceiling, never stale per-bucket carryover") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_kw").toString + "/t"
    val snap = (0 until 50).map(i => (i, i * 1.0)).toDF("pk", "val") // Int key
    PartitionedUpsert.init(snap, dir, "pk", 4)
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 7, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 4)
    // Int and Long hash differently: the widen rehashes every row, so
    // per-bucket lsn history is meaningless under the new identities
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.WidenColumn("pk", org.apache.spark.sql.types.LongType)), "pk", 4)
    val st = PartitionedUpsert.bucketStats(spark, dir).toMap
    assert(st.values.forall(_.maxLsn.contains(100L)),
      s"post-widen watermarks must take the global ceiling, got $st")
    // a consumer asking for changes since the ceiling correctly gets none
    assert(PartitionedUpsert.bucketsChangedSince(spark, dir, 100L).isEmpty)
  }

  test("an empty change batch (idle streaming trigger) burns no table " +
      "version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_eb").toString + "/t"
    mkTarget(dir, n = 10L, nBuckets = 2)
    val v = PartitionedUpsert.history(spark, dir).head._1
    val touched = PartitionedUpsert.merge(spark, dir,
      Seq.empty[(Long, Long, String, Double)].toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 2)
    assert(touched.isEmpty)
    assert(PartitionedUpsert.history(spark, dir).head._1 === v,
      "no manifest version may be burned for a no-op batch")
  }

  test("readKeyRange rejects non-integral keys loudly instead of " +
      "silently returning nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_sk").toString + "/t"
    val snap = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "val")
    PartitionedUpsert.init(snap, dir, "k", 2)
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.readKeyRange(spark, dir, 0L, 10L)
    }
    assert(e.getMessage.contains("numeric key"))
    // NUMERIC non-integral keys (decimal surrogate ids) still work:
    // stats are absent (conservative full read), results correct
    import spark.implicits._
    val ddir = java.nio.file.Files.createTempDirectory("graft_ms_dk").toString + "/t"
    val dsnap = Seq((BigDecimal(1), 1.0), (BigDecimal(7), 7.0),
      (BigDecimal(1500), 15.0)).toDF("k", "val")
    PartitionedUpsert.init(dsnap, ddir, "k", 2)
    val got = PartitionedUpsert.readKeyRange(spark, ddir, 0L, 10L)
      .collect().map(_.getDouble(1)).toSet
    assert(got === Set(1.0, 7.0))
  }

  test("stats stay coherent across compactFiles and rebucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ms_cr").toString + "/t"
    import spark.implicits._
    val snap = (0L until 200L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap.repartition(8), dir, "pk", 2)
    PartitionedUpsert.merge(spark, dir,
      Seq((500L, 5L, "u", -5.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 2)
    val pre = PartitionedUpsert.bucketStats(spark, dir).toMap
    PartitionedUpsert.compactFiles(spark, dir, maxFilesPerBucket = 1)
    val post = PartitionedUpsert.bucketStats(spark, dir).toMap
    post.foreach { case (b, s) =>
      assert(s.files === 1, "compacted buckets hold one file")
      assert(s.minKey === pre(b).minKey && s.maxKey === pre(b).maxKey,
        "compaction is bit-identical data — ranges must not move")
      assert(s.maxLsn === pre(b).maxLsn, "watermarks carry through compaction")
    }
    PartitionedUpsert.rebucket(spark, dir, "pk", newBuckets = 4)
    // after rehashing, every bucket takes the conservative global
    // ceiling; range pruning still answers correctly
    val reb = PartitionedUpsert.bucketStats(spark, dir).toMap
    assert(reb.values.forall(_.maxLsn.contains(500L)))
    val hit = PartitionedUpsert.readKeyRange(spark, dir, 5L, 5L)
    assert(hit.count() === 1 && hit.head().getDouble(1) === -5.0)
  }

  test("a merge touching >64 buckets (fused-observe cutoff) records " +
      "the SAME per-bucket ranges and watermarks through the fallback " +
      "scan as the observe path records below it") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ms_wide").toString + "/t"
    mkTarget(dir, n = 512L, nBuckets = 128)
    // a batch whose keys hash across >64 buckets forces the fallback
    val wide = (0L until 512L by 4L).map(i => (1000L + i, i, "u", -i * 1.0))
      .toDF("lsn", "pk", "op", "val")
    val touched = PartitionedUpsert.merge(spark, dir, wide,
      "pk", "lsn", "op", Seq("val"), 128)
    assert(touched.size > 64, s"fixture must cross the cutoff, got ${touched.size}")
    val after = PartitionedUpsert.bucketStats(spark, dir).toMap
    // ground truth per touched bucket off the committed data itself
    val truth = PartitionedUpsert.read(spark, dir)
      .withColumn("b", PartitionedUpsert.bucketOf(col("pk"), 128))
      .groupBy($"b").agg(min($"pk").as("mn"), max($"pk").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    touched.foreach { b =>
      assert(after(b).minKey.contains(truth(b)._1) &&
        after(b).maxKey.contains(truth(b)._2),
        s"bucket $b ranges must match the data: ${after(b)} vs ${truth(b)}")
      assert(after(b).maxLsn.exists(_ >= 1000L),
        s"bucket $b must carry this batch's watermark")
    }
  }
}
