package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintained per-group audience profiles (the theta instantiation of
  * the shared SketchMaintain core): exact-mode cardinalities and
  * CROSS-GROUP overlaps are exactly right after every window,
  * staleness tracks removals/moves, scoped refresh resets the flagged
  * group, replays no-op. */
class ThetaMaintainSpec extends SparkSpec {

  private val K = 4096

  test("window unions, cross-group overlap on stored blobs, " +
      "staleness, scoped refresh, replay no-op — theta instantiation") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tm").toString
    val (srcDir, tDir) = (s"$base/src", s"$base/t")
    // membership rows: group a holds users 0..299, b holds 200..499
    // (overlap 100); pk identifies the (group, user) membership row
    val seed = (0 until 300).map(i => (i.toLong, "a", s"u$i")) ++
      (200 until 500).map(i => (1000L + i, "b", s"u$i"))
    PartitionedUpsert.init(seed.toDF("pk", "grp", "user"), srcDir, "pk", 4)
    ThetaMaintain.init(spark, srcDir, tDir, Seq("grp"), "user", K, 4)
    def prof() = ThetaMaintain.read(spark, tDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n"), r.getAs[Long]("stale"),
          r.getAs[Long]("ndv"))).toMap
    val p0 = prof()
    assert(p0("a") === ((300L, 0L, 300L)))
    assert(p0("b") === ((300L, 0L, 300L)))
    // cross-group overlap straight off the stored blobs
    val ov0 = ThetaMaintain.overlaps(spark, tDir).collect()
    assert(ov0.length === 1)
    assert(ov0.head.getAs[Long]("n_intersect") === 100L)

    // window: 50 NEW users join a; 30 users leave b (deletes)
    PartitionedUpsert.merge(spark, srcDir,
      ((500 until 550).map(i => (2000L + i, 3000L + i, "u", "a", s"u$i")) ++
        (200 until 230).map(i => (1000L + i, 4000L + i, "d", "b", "x")))
        .toDF("pk", "lsn", "op", "grp", "user"),
      "pk", "lsn", "op", Seq("grp", "user"), nBuckets = 4)
    ThetaMaintain.maintain(spark, srcDir, tDir, "user", K)
    val p1 = prof()
    assert(p1("a") === ((350L, 0L, 350L)), "new members union in exactly")
    assert(p1("b")._2 === 30L, "departures bump stale (theta cannot subtract)")
    assert(p1("b")._3 === 300L, "the estimate still reflects every insert seen")
    // overlap now includes the stale members — the stale counter is
    // exactly the signal that schedules the refresh
    ThetaMaintain.refresh(spark, srcDir, tDir, Seq("b").toDF("grp"), "user", K)
    val p2 = prof()
    assert(p2("b") === ((270L, 0L, 270L)))
    assert(p2("a") === p1("a"), "refresh must touch only the given groups")
    val ov1 = ThetaMaintain.overlaps(spark, tDir).collect()
    // b lost users 200..229; overlap with a (0..299) drops to 70
    assert(ov1.head.getAs[Long]("n_intersect") === 70L)

    // replay no-op
    val before = PartitionedUpsert.currentManifest(spark, tDir).get.version
    val (f, t) = ThetaMaintain.maintain(spark, srcDir, tDir, "user", K)
    assert(f === t)
    assert(PartitionedUpsert.currentManifest(spark, tDir).get.version === before)
  }
}
