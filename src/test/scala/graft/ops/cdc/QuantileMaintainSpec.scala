package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KllQuantiles

/** Maintained per-group quantile profiles: insert windows union
  * exactly (counts exact, ranks in the published band), removals and
  * group-moves bump the right group's staleness, the live invariant
  * n − stale = live rows holds after every window, scoped refresh
  * resets exactly the flagged group, and replays no-op. */
class QuantileMaintainSpec extends SparkSpec {

  private def liveCounts(srcDir: String): Map[String, Long] =
    PartitionedUpsert.read(spark, srcDir)
      .filter(col("v").isNotNull)
      .groupBy(col("grp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def profile(qDir: String) =
    PartitionedUpsert.read(spark, qDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Array[Byte]]("sketch").toSeq, r.getAs[Long]("n"),
          r.getAs[Long]("stale"))).toMap

  test("window unions, staleness accounting, group moves, scoped " +
      "refresh, replay no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_qm").toString
    val (srcDir, qDir) = (s"$base/src", s"$base/q")
    val rnd = new scala.util.Random(3)
    val seed = (1L to 400L).map(pk =>
      (pk, if (pk <= 200) "a" else "b", rnd.nextGaussian() * 50 + 100))
    PartitionedUpsert.init(seed.toDF("pk", "grp", "v"), srcDir, "pk", 4)
    QuantileMaintain.init(spark, srcDir, qDir, Seq("grp"), "v",
      k = 200, nBuckets = 4)
    val p0 = profile(qDir)
    assert(p0("a")._2 === 200L && p0("a")._3 === 0L)
    assert(KllQuantiles.countOf(p0("a")._1.toArray) === 200L)

    def window(rows: Seq[(Long, Long, String, String, Any)]): Unit = {
      PartitionedUpsert.merge(spark, srcDir,
        rows.map { case (pk, lsn, op, g, v) =>
          (pk, lsn, op, g, v.asInstanceOf[Double]) }
          .toDF("pk", "lsn", "op", "grp", "v"),
        "pk", "lsn", "op", Seq("grp", "v"), nBuckets = 4)
      QuantileMaintain.maintain(spark, srcDir, qDir, "v", k = 200): Unit
    }

    // window 1: 100 inserts into a — pure union, no staleness
    window((1000L until 1100L).map(pk =>
      (pk, pk, "u", "a", rnd.nextGaussian() * 50 + 100.0)))
    val p1 = profile(qDir)
    assert(p1("a")._2 === 300L && p1("a")._3 === 0L)
    assert(KllQuantiles.countOf(p1("a")._1.toArray) === 300L)
    assert(p1("b") === p0("b"), "untouched group must not rewrite")
    // live invariant + in-band median vs the live rows
    assert(p1("a")._2 - p1("a")._3 === liveCounts(srcDir)("a"))
    val exactA = PartitionedUpsert.read(spark, srcDir)
      .filter($"grp" === "a")
      .agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(math.abs(KllQuantiles.rankOf(p1("a")._1.toArray, exactA) - 0.5) < 0.03)

    // window 2: 50 deletes in a; 10 value-updates in b; 5 moves b→a
    window(
      (1L to 50L).map(pk => (pk, 2000L + pk, "d", "a", 0.0)) ++
      (201L to 210L).map(pk => (pk, 2100L + pk, "u", "b", 999.0)) ++
      (211L to 215L).map(pk => (pk, 2200L + pk, "u", "a", 555.0)))
    val p2 = profile(qDir)
    assert(p2("a")._3 === 50L, "deletes bump the deleted group's stale")
    assert(p2("a")._2 === 305L, "moved-in values enter the new group's sketch")
    assert(p2("b")._3 === 15L,
      "value updates AND moved-out rows bump the old group's stale")
    assert(p2("b")._2 === 210L, "changed updates re-enter their group")
    val live = liveCounts(srcDir)
    assert(p2("a")._2 - p2("a")._3 === live("a"))
    assert(p2("b")._2 - p2("b")._3 === live("b"))

    // scoped refresh: group a rebuilds (stale resets, count = live);
    // b keeps its flagged state
    QuantileMaintain.refresh(spark, srcDir, qDir,
      Seq("a").toDF("grp"), "v", k = 200)
    val p3 = profile(qDir)
    assert(p3("a")._3 === 0L && p3("a")._2 === live("a"))
    assert(KllQuantiles.countOf(p3("a")._1.toArray) === live("a"))
    assert(p3("b") === p2("b"), "refresh must touch only the given groups")

    // replay: maintaining at the already-applied version no-ops
    val before = PartitionedUpsert.currentManifest(spark, qDir).get.version
    val (f, t) = QuantileMaintain.maintain(spark, srcDir, qDir, "v", 200)
    assert(f === t)
    assert(PartitionedUpsert.currentManifest(spark, qDir).get.version === before)

    // read view derives quantiles per row
    val rows = QuantileMaintain.read(spark, qDir, Seq(0.5))
      .select($"grp", element_at($"quantiles", 1).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === Set("a", "b"))
  }
}
