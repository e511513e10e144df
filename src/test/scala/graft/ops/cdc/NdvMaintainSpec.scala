package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintained per-group NDV profiles (the HLL instantiation of the
  * shared SketchMaintain core): insert windows union exactly (HLL is
  * EXACT below its sparse threshold, so small-cardinality assertions
  * are equality, not tolerance), staleness tracks removals and moves,
  * scoped refresh resets exactly the flagged group, replays no-op,
  * and the stored blobs read with the vanilla hll_sketch_estimate
  * builtin. */
class NdvMaintainSpec extends SparkSpec {

  private def profile(nDir: String) =
    NdvMaintain.read(spark, nDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n"), r.getAs[Long]("stale"),
          r.getAs[Long]("ndv"))).toMap

  test("window unions, staleness accounting, group moves, scoped " +
      "refresh, replay no-op — HLL instantiation") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_nm").toString
    val (srcDir, nDir) = (s"$base/src", s"$base/n")
    // group a: 200 rows over 40 distinct values; b: 200 rows over 10
    val seed = (1L to 400L).map { pk =>
      val grp = if (pk <= 200) "a" else "b"
      val v = if (grp == "a") s"v${pk % 40}" else s"w${pk % 10}"
      (pk, grp, v)
    }
    PartitionedUpsert.init(seed.toDF("pk", "grp", "v"), srcDir, "pk", 4)
    NdvMaintain.init(spark, srcDir, nDir, Seq("grp"), "v", nBuckets = 4)
    val p0 = profile(nDir)
    assert(p0("a") === ((200L, 0L, 40L)))
    assert(p0("b") === ((200L, 0L, 10L)))

    def window(rows: Seq[(Long, Long, String, String, String)]): Unit = {
      PartitionedUpsert.merge(spark, srcDir,
        rows.toDF("pk", "lsn", "op", "grp", "v"),
        "pk", "lsn", "op", Seq("grp", "v"), nBuckets = 4)
      NdvMaintain.maintain(spark, srcDir, nDir, "v"): Unit
    }

    // window 1: 50 inserts into a with 10 NEW values — union exact
    window((1000L until 1050L).map(pk =>
      (pk, pk, "u", "a", s"nv${pk % 10}")))
    val p1 = profile(nDir)
    assert(p1("a") === ((250L, 0L, 50L)), "10 new values union in exactly")
    assert(p1("b") === p0("b"), "untouched group must not rewrite")

    // window 2: deletes in a (HLL cannot subtract -> stale), value
    // updates in b, moves b->a
    window(
      (1L to 30L).map(pk => (pk, 2000L + pk, "d", "a", "x")) ++
      (201L to 205L).map(pk => (pk, 2100L + pk, "u", "b", "wnew")) ++
      (206L to 208L).map(pk => (pk, 2200L + pk, "u", "a", "moved")))
    val p2 = profile(nDir)
    assert(p2("a")._1 === 253L && p2("a")._2 === 30L)
    assert(p2("a")._3 === 51L, "moved-in value is one new distinct")
    assert(p2("b")._1 === 205L && p2("b")._2 === 8L,
      "value updates re-enter their group (n +5); updates AND " +
        "moved-out rows bump the old group's stale (5 + 3)")
    assert(p2("b")._3 === 11L, "'wnew' enters b's sketch")

    // scoped refresh: a rebuilds exactly from live rows; b untouched
    NdvMaintain.refresh(spark, srcDir, nDir, Seq("a").toDF("grp"), "v")
    val p3 = profile(nDir)
    val liveA = PartitionedUpsert.read(spark, srcDir)
      .filter($"grp" === "a")
    assert(p3("a")._1 === liveA.count())
    assert(p3("a")._2 === 0L)
    assert(p3("a")._3 === liveA.select("v").distinct().count())
    assert(p3("b") === p2("b"), "refresh must touch only the given groups")

    // replay no-op
    val before = PartitionedUpsert.currentManifest(spark, nDir).get.version
    val (f, t) = NdvMaintain.maintain(spark, srcDir, nDir, "v")
    assert(f === t)
    assert(PartitionedUpsert.currentManifest(spark, nDir).get.version === before)

    // interop: the maintained blob unions with a fresh hll_sketch_agg
    // blob through the hll_union BUILTIN (vanilla-Spark mergeable)
    val fresh = Seq("z1", "z2").toDF("v")
      .agg(hll_sketch_agg($"v").as("s2"))
    val stored = PartitionedUpsert.read(spark, nDir)
      .filter($"grp" === "b").select($"sketch".as("s1"))
    val merged = stored.crossJoin(fresh)
      .select(hll_sketch_estimate(hll_union($"s1", $"s2")).as("e"))
      .head().getLong(0)
    assert(merged === p3("b")._3 + 2)
  }
}
