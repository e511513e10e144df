package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Range-clustered table layout: interior key ranges prune to the
  * covering buckets (the thing hash bucketing cannot do), merges and
  * point lookups route by the manifest's recorded split points, and
  * re-splitting goes through rebucket like any other layout change. */
class RangeLayoutSpec extends SparkSpec {

  private def bucketDirsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct.toSeq

  private def mkRange(dir: String, n: Long = 1000L, nBuckets: Int = 8): Unit = {
    import spark.implicits._
    val snap = (0L until n).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets,
      layout = PartitionedUpsert.LayoutRange)
  }

  test("interior key range reads only the covering buckets, results " +
      "identical to the unpruned filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rl").toString + "/t"
    mkRange(dir) // keys 0..999 range-clustered into 8 buckets
    val m = PartitionedUpsert.currentManifest(spark, dir).get
    assert(m.layout === PartitionedUpsert.LayoutRange)
    assert(m.splits.length === 7)
    assert(m.splits === m.splits.sorted, "split points must ascend")
    // an INTERIOR ~12% range — under hash this spans all 8 buckets
    val ranged = PartitionedUpsert.readKeyRange(spark, dir, 450L, 570L)
    assert(bucketDirsOf(ranged).length <= 2,
      s"a ~1-bucket-wide interior range must read <= 2 buckets, got " +
        bucketDirsOf(ranged).mkString(", "))
    val expect = PartitionedUpsert.read(spark, dir)
      .filter($"pk" >= 450L && $"pk" <= 570L)
    assert(ranged.collect().map(_.getLong(0)).sorted.toSeq ===
      expect.collect().map(_.getLong(0)).sorted.toSeq)
    // contrast: the SAME table under hash layout reads every bucket
    val hashDir = java.nio.file.Files.createTempDirectory("graft_rlh")
      .toString + "/t"
    PartitionedUpsert.init((0L until 1000L).map(i => (i, i * 1.0))
      .toDF("pk", "val"), hashDir, "pk", 8)
    assert(bucketDirsOf(
      PartitionedUpsert.readKeyRange(spark, hashDir, 450L, 570L)).length === 8)
  }

  test("merge routes by split points: updates land in their keys' " +
      "buckets, reads stay correct, point lookups stay pruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rlm").toString + "/t"
    mkRange(dir)
    val touched = PartitionedUpsert.merge(spark, dir,
      Seq((5000L, 10L, "u", -1.0), (5001L, 990L, "u", -2.0),
        (5002L, 2000L, "c", -3.0)) // key ABOVE the planned range
        .toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 8)
    // keys 10 and 990 sit at opposite ends → different buckets; 2000
    // routes past the last split into the top bucket
    assert(touched.length >= 2)
    val state = PartitionedUpsert.read(spark, dir)
    assert(state.count() === 1001)
    assert(state.filter($"pk" === 10L).head().getDouble(1) === -1.0)
    assert(state.filter($"pk" === 2000L).head().getDouble(1) === -3.0)
    // a 2-key point lookup via the range router reads <= 2 buckets
    val probe = PartitionedUpsert.readForKeys(spark, dir,
      Seq(10L, 990L).toDF("pk"), "pk")
    assert(bucketDirsOf(probe).length <= 2)
    assert(probe.filter($"pk".isin(10L, 990L)).count() === 2)
    // out-of-range key is findable through the same router
    assert(PartitionedUpsert.readForKeys(spark, dir,
      Seq(2000L).toDF("pk"), "pk").filter($"pk" === 2000L).count() === 1)
  }

  test("rebucket re-plans the split points at the new count; pruning " +
      "and contents survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rlr").toString + "/t"
    mkRange(dir, nBuckets = 4)
    val before = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    PartitionedUpsert.rebucket(spark, dir, "pk", 16)
    val m = PartitionedUpsert.currentManifest(spark, dir).get
    assert(m.nBuckets === 16 && m.splits.length === 15)
    val after = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after === before)
    val ranged = PartitionedUpsert.readKeyRange(spark, dir, 500L, 560L)
    assert(bucketDirsOf(ranged).length <= 2,
      s"re-split table must still prune, got ${bucketDirsOf(ranged)}")
    assert(ranged.count() === 61)
  }

  test("range layout demands an integral key; the manifest round-trips " +
      "layout and splits; hash stays the default") {
    import spark.implicits._
    val bad = java.nio.file.Files.createTempDirectory("graft_rlb").toString + "/t"
    intercept[IllegalArgumentException] {
      PartitionedUpsert.init(Seq(("a", 1.0), ("b", 2.0)).toDF("pk", "val"),
        bad, "pk", 4, layout = PartitionedUpsert.LayoutRange)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rlp").toString + "/t"
    mkRange(dir, n = 100L, nBuckets = 4)
    // a merge republishes the manifest — layout and splits must survive
    // the round-trip through the line format
    val before = PartitionedUpsert.currentManifest(spark, dir).get
    PartitionedUpsert.merge(spark, dir,
      Seq((9000L, 1L, "u", 9.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 4)
    val after = PartitionedUpsert.currentManifest(spark, dir).get
    assert(after.layout === PartitionedUpsert.LayoutRange)
    assert(after.splits === before.splits)
    // default-layout tables parse as hash with no splits
    val hashDir = java.nio.file.Files.createTempDirectory("graft_rld")
      .toString + "/t"
    PartitionedUpsert.init(Seq((1L, 1.0)).toDF("pk", "val"), hashDir, "pk", 2)
    val hm = PartitionedUpsert.currentManifest(spark, hashDir).get
    assert(hm.layout === PartitionedUpsert.LayoutHash && hm.splits.isEmpty)
  }
}
