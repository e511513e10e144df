package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FreqSketchAgg

/** Maintained per-group frequent-items profiles (the heavy-hitter
  * member of the maintained-distribution family): insert windows
  * union exactly (stream lengths exact, planted hitters stay ranked),
  * removals and group-moves bump the right group's staleness, the
  * live invariant n − stale = live rows holds after every window,
  * scoped refresh resets exactly the flagged group, and replays
  * no-op. Mirrors QuantileMaintainSpec — the shared SketchMaintain
  * core must behave identically under the second instantiation. */
class FreqMaintainSpec extends SparkSpec {

  private def liveCounts(srcDir: String): Map[String, Long] =
    PartitionedUpsert.read(spark, srcDir)
      .filter(col("item").isNotNull)
      .groupBy(col("grp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def profile(fDir: String) =
    PartitionedUpsert.read(spark, fDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Array[Byte]]("sketch").toSeq, r.getAs[Long]("n"),
          r.getAs[Long]("stale"))).toMap

  test("window unions, staleness accounting, group moves, scoped " +
      "refresh, replay no-op — frequent-items instantiation") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_fm").toString
    val (srcDir, fDir) = (s"$base/src", s"$base/f")
    // group a: 'hot' is 40% of the stream; group b: 'warm' is 30%
    def item(grp: String, i: Long): String = grp match {
      case "a" => if (i % 5 < 2) "hot" else s"tail_a_${i % 37}"
      case _   => if (i % 10 < 3) "warm" else s"tail_b_${i % 41}"
    }
    val seed = (1L to 400L).map(pk =>
      (pk, if (pk <= 200) "a" else "b", item(if (pk <= 200) "a" else "b", pk)))
    PartitionedUpsert.init(seed.toDF("pk", "grp", "item"), srcDir, "pk", 4)
    FreqMaintain.init(spark, srcDir, fDir, Seq("grp"), "item",
      maxMapSize = 64, nBuckets = 4)
    val p0 = profile(fDir)
    assert(p0("a")._2 === 200L && p0("a")._3 === 0L)
    assert(FreqSketchAgg.streamLength(p0("a")._1.toArray) === 200L)
    assert(FreqSketchAgg.topK(p0("a")._1.toArray, 1).head._1 === "hot")

    def window(rows: Seq[(Long, Long, String, String, String)]): Unit = {
      PartitionedUpsert.merge(spark, srcDir,
        rows.toDF("pk", "lsn", "op", "grp", "item"),
        "pk", "lsn", "op", Seq("grp", "item"), nBuckets = 4)
      FreqMaintain.maintain(spark, srcDir, fDir, "item",
        maxMapSize = 64): Unit
    }

    // window 1: 100 inserts into a (hitter share preserved) — pure
    // union, no staleness; the hitter survives the merge
    window((1000L until 1100L).map(pk =>
      (pk, pk, "u", "a", item("a", pk))))
    val p1 = profile(fDir)
    assert(p1("a")._2 === 300L && p1("a")._3 === 0L)
    assert(FreqSketchAgg.streamLength(p1("a")._1.toArray) === 300L)
    assert(FreqSketchAgg.topK(p1("a")._1.toArray, 1).head._1 === "hot")
    assert(p1("b") === p0("b"), "untouched group must not rewrite")
    assert(p1("a")._2 - p1("a")._3 === liveCounts(srcDir)("a"))
    // the hitter's bounds bracket its true live count
    val (_, _, lbA, ubA) = FreqSketchAgg.topK(p1("a")._1.toArray, 1).head
    val trueHot = PartitionedUpsert.read(spark, srcDir)
      .filter($"grp" === "a" && $"item" === "hot").count()
    assert(lbA <= trueHot && trueHot <= ubA)

    // window 2: 50 deletes in a; 10 item-updates in b; 5 moves b→a
    window(
      (1L to 50L).map(pk => (pk, 2000L + pk, "d", "a", "x")) ++
      (201L to 210L).map(pk => (pk, 2100L + pk, "u", "b", "renamed")) ++
      (211L to 215L).map(pk => (pk, 2200L + pk, "u", "a", "moved")))
    val p2 = profile(fDir)
    assert(p2("a")._3 === 50L, "deletes bump the deleted group's stale")
    assert(p2("a")._2 === 305L, "moved-in items enter the new group's sketch")
    assert(p2("b")._3 === 15L,
      "item updates AND moved-out rows bump the old group's stale")
    assert(p2("b")._2 === 210L, "changed updates re-enter their group")
    val live = liveCounts(srcDir)
    assert(p2("a")._2 - p2("a")._3 === live("a"))
    assert(p2("b")._2 - p2("b")._3 === live("b"))

    // scoped refresh: group a rebuilds (stale resets, count = live);
    // b keeps its flagged state
    FreqMaintain.refresh(spark, srcDir, fDir,
      Seq("a").toDF("grp"), "item", maxMapSize = 64)
    val p3 = profile(fDir)
    assert(p3("a")._3 === 0L && p3("a")._2 === live("a"))
    assert(FreqSketchAgg.streamLength(p3("a")._1.toArray) === live("a"))
    assert(p3("b") === p2("b"), "refresh must touch only the given groups")

    // replay: maintaining at the already-applied version no-ops
    val before = PartitionedUpsert.currentManifest(spark, fDir).get.version
    val (f, t) = FreqMaintain.maintain(spark, srcDir, fDir, "item", 64)
    assert(f === t)
    assert(PartitionedUpsert.currentManifest(spark, fDir).get.version === before)

    // read view derives the per-group top items per row
    val rows = FreqMaintain.read(spark, fDir, k = 3)
      .select($"grp", $"top_items".getItem(0).getField("_1").as("top1"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("a") === "hot")
  }
}
