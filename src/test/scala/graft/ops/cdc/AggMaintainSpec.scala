package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental aggregate maintenance from the CDF: the maintained
  * table must equal a full recompute after every version window —
  * through inserts, value updates, null flips, group-migration
  * updates, and deletes that empty a group — while reading only
  * changed source buckets and touched aggregate buckets. */
class AggMaintainSpec extends SparkSpec {

  private val G = Seq("grp")
  private val S = Seq("v")

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_am").toString
    (s"$base/src", s"$base/agg")
  }

  /** Direct recompute reference, via the same exposed view. */
  private def direct(srcDir: String) = AggMaintain.exposed(
    AggMaintain.fullAggregate(PartitionedUpsert.read(spark, srcDir), G, S),
    G, S)

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
      Option(r.getAs[java.lang.Long]("sum_v")).map(_.longValue),
      Option(r.getAs[java.lang.Double]("avg_v")).map(_.doubleValue)))
    .sortBy(_._1).toSeq

  private def assertCurrent(srcDir: String, aggDir: String): Unit =
    assert(rows(AggMaintain.readAggregate(spark, aggDir)) ===
      rows(direct(srcDir)),
      "maintained aggregate must equal a full recompute")

  test("multi-version equivalence: inserts, updates, null flips, " +
      "group moves, and a group-emptying delete all compose") {
    import spark.implicits._
    val (srcDir, aggDir) = freshDirs()
    // grp 'solo' has exactly one key → later delete empties the group
    val snap = Seq(
      (1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "a", java.lang.Long.valueOf(20L)),
      (3L, "b", java.lang.Long.valueOf(30L)),
      (4L, "b", null.asInstanceOf[java.lang.Long]),
      (5L, "solo", java.lang.Long.valueOf(50L))
    ).toDF("pk", "grp", "v")
    PartitionedUpsert.init(snap, srcDir, "pk", 4)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    assertCurrent(srcDir, aggDir)

    // window 1: insert, in-group value update, value→null flip
    PartitionedUpsert.merge(spark, srcDir,
      Seq((100L, 6L, "c", "a", java.lang.Long.valueOf(60L)),
        (101L, 1L, "u", "a", java.lang.Long.valueOf(11L)),
        (102L, 3L, "u", "b", null.asInstanceOf[java.lang.Long]))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 4)
    val (f1, t1) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(f1 < t1)
    assertCurrent(srcDir, aggDir)

    // window 2: group-migration update (a→b) and a plain delete
    PartitionedUpsert.merge(spark, srcDir,
      Seq((200L, 2L, "u", "b", java.lang.Long.valueOf(21L)),
        (201L, 4L, "d", "b", null.asInstanceOf[java.lang.Long]))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 4)
    // window 3 BEFORE maintaining — the step must catch up across both
    PartitionedUpsert.merge(spark, srcDir,
      Seq((300L, 5L, "d", "solo", null.asInstanceOf[java.lang.Long]))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 4)
    val (f2, t2) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(t2 - f2 == 2, "one step must span both source versions")
    assertCurrent(srcDir, aggDir)
    // the emptied group is GONE, not a zero row
    assert(!rows(AggMaintain.readAggregate(spark, aggDir))
      .exists(_._1 == "solo"))
  }

  test("a current aggregate is a zero-read no-op; a replayed step is a " +
      "metadata no-op (txn-guarded); foreign aggDir rejected") {
    import spark.implicits._
    val (srcDir, aggDir) = freshDirs()
    PartitionedUpsert.init(
      Seq((1L, "a", java.lang.Long.valueOf(1L))).toDF("pk", "grp", "v"),
      srcDir, "pk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    // already current: (from, from), no aggregate version burned
    val v0 = PartitionedUpsert.currentManifest(spark, aggDir).get.version
    val (fa, ta) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(fa === ta)
    assert(PartitionedUpsert.currentManifest(spark, aggDir).get.version === v0)
    // advance the source, maintain, then REPLAY the same window: the
    // second call sees txns already at the source version
    PartitionedUpsert.merge(spark, srcDir,
      Seq((10L, 2L, "c", "a", java.lang.Long.valueOf(2L)))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 2)
    AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    val v1 = PartitionedUpsert.currentManifest(spark, aggDir).get.version
    val (fb, tb) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(fb === tb)
    assert(PartitionedUpsert.currentManifest(spark, aggDir).get.version === v1)
    assertCurrent(srcDir, aggDir)
    // an upsert table that was never initAggregate'd from this source
    val stray = freshDirs()._2
    PartitionedUpsert.init(
      Seq((1L, "x", java.lang.Long.valueOf(1L))).toDF("pk", "grp", "v"),
      stray, "pk", 2)
    intercept[IllegalStateException] {
      AggMaintain.maintainAggregate(spark, srcDir, stray)
    }
  }

  test("a zero-row-change window (source rebucket) still advances the " +
      "cursor — no eternal re-diff; colliding group names rejected") {
    import spark.implicits._
    val (srcDir, aggDir) = freshDirs()
    PartitionedUpsert.init(
      (0L until 32L).map(i => (i, s"g${i % 3}", java.lang.Long.valueOf(i)))
        .toDF("pk", "grp", "v"), srcDir, "pk", 4)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    // version bumps, every bucket path changes, zero row changes
    PartitionedUpsert.rebucket(spark, srcDir, "pk", 8)
    val (f, t) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(f < t, "the step must claim the window it examined")
    // the cursor moved: the next call is the zero-read fast path
    val (f2, t2) = AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assert(f2 === t2)
    assertCurrent(srcDir, aggDir)
    // a group column named like a measure would be misclassified by
    // specOf — rejected at init, the only moment the spec is explicit
    intercept[IllegalArgumentException] {
      AggMaintain.initAggregate(spark, srcDir, freshDirs()._2,
        Seq("s_grp"), S, nBuckets = 2)
    }
  }

  test("CDF window pruning: a window whose merge touched one bucket " +
      "reads only that bucket's files, on both manifest sides") {
    import spark.implicits._
    val (srcDir, aggDir) = freshDirs()
    val snap = (0L until 64L).map(i => (i, s"g${i % 4}",
      java.lang.Long.valueOf(i))).toDF("pk", "grp", "v")
    PartitionedUpsert.init(snap, srcDir, "pk", 8)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    val vFrom = PartitionedUpsert.currentManifest(spark, srcDir).get.version
    // one key → exactly one touched source bucket
    val touched = PartitionedUpsert.merge(spark, srcDir,
      Seq((500L, 7L, "u", "g3", java.lang.Long.valueOf(700L)))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 8)
    assert(touched.length === 1)
    val vTo = PartitionedUpsert.currentManifest(spark, srcDir).get.version
    val changes = PartitionedUpsert.changesBetweenImages(
      spark, srcDir, vFrom, vTo)
    // plan-level input files: old + new copies of the ONE changed bucket
    val bucketDirs = changes.inputFiles
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(bucketDirs.length <= 2,
      s"one changed bucket must read <= 2 bucket dirs, got " +
        bucketDirs.mkString(", "))
    assert(bucketDirs.forall(_.endsWith(s"bucket=${touched.head}")))
    val chg = changes.collect()
    assert(chg.length === 1)
    val r = chg.head
    assert(r.getAs[String]("change_type") === "update")
    assert(r.getAs[org.apache.spark.sql.Row]("before").getAs[Long]("v") === 7L)
    assert(r.getAs[org.apache.spark.sql.Row]("after").getAs[Long]("v") === 700L)
    AggMaintain.maintainAggregate(spark, srcDir, aggDir)
    assertCurrent(srcDir, aggDir)
  }
}
