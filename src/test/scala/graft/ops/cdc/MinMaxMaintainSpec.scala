package graft.ops.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The min/max reserve algebra: exact extremes through extreme-deletes
  * (K-deep, zero source reads), watermark/tail discipline, exhaustion
  * flagging, and the scoped rescan — the behavioral proof that a
  * maintenance step reads only the flagged groups. */
class MinMaxMaintainSpec extends SparkSpec {

  private val G = Seq("grp")
  private val C = Seq("v")

  private def df(rows: Seq[(Long, String, Option[Long])]): DataFrame = {
    import spark.implicits._
    rows.map { case (pk, g, v) => (pk, g, v.map(Long.box).orNull) }
      .toDF("pk", "grp", "v")
      .select($"pk", $"grp", $"v".cast("long").as("v"))
  }

  /** One maintenance round: seed from `s1`, compose diff(s1→s2),
    * rescan flagged groups from s2, expose. */
  private def maintained(s1: DataFrame, s2: DataFrame, k: Int): DataFrame = {
    val seed = MinMaxMaintain.fullMinMaxState(s1, G, C, k)
    step(seed, s1, s2, k)
  }

  private def step(prior: DataFrame, s1: DataFrame, s2: DataFrame,
                   k: Int): DataFrame = {
    val d = MinMaxMaintain.deltaMinMax(prior,
      AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")), G, C, k)
    MinMaxMaintain.rescanMerge(d, s2, G, C, k)
  }

  private def rows(exposedOrState: DataFrame): Seq[(String, Long, Option[Long], Option[Long])] =
    exposedOrState.collect().map(r => (
      r.getAs[String]("grp"), r.getAs[Long]("cnt"),
      Option(r.getAs[java.lang.Long]("min_v")).map(_.longValue),
      Option(r.getAs[java.lang.Long]("max_v")).map(_.longValue)))
      .sortBy(_._1).toSeq

  private def direct(s: DataFrame): Seq[(String, Long, Option[Long], Option[Long])] =
    s.groupBy("grp").agg(count(lit(1)).as("cnt"),
        min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => (
        r.getAs[String]("grp"), r.getAs[Long]("cnt"),
        Option(r.getAs[java.lang.Long]("min_v")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("max_v")).map(_.longValue)))
      .sortBy(_._1).toSeq

  test("equivalence through inserts, updates, null flips, group " +
      "moves, vanish, and extreme-deletes; matches direct min/max") {
    val s1 = df(Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(20L)), (3L, "a", Some(30L)),
      (4L, "b", Some(5L)), (5L, "b", None),
      (6L, "c", Some(7L)),
      (7L, "d", None)))
    val s2 = df(Seq(
      (1L, "a", Some(10L)),
      (2L, "b", Some(20L)),          // group move a→b
      (3L, "a", None),               // value → null (extreme delete)
      (4L, "b", Some(50L)),          // update to new max
      (5L, "b", Some(1L)),           // null → value (new min)
      // pk 6 deleted: group c vanishes
      (7L, "d", None),               // all-null group persists
      (8L, "e", Some(99L))))         // brand-new group
    val got = rows(MinMaxMaintain.exposedMinMax(maintained(s1, s2, k = 2), G, C))
    assert(got === direct(s2))
    assert(!got.exists(_._1 == "c"), "vanished group must drop")
    assert(got.find(_._1 == "d").get._3.isEmpty, "all-null group: NULL min")
  }

  test("deleting the group max within reserve depth needs NO rescan " +
      "(the flag stays false for every group)") {
    val s1 = df((1L to 6L).map(i => (i, "g", Some(i * 10))))
    val s2 = df((1L to 5L).map(i => (i, "g", Some(i * 10)))) // max 60 deleted
    val seed = MinMaxMaintain.fullMinMaxState(s1, G, C, 2)
    val stepped = MinMaxMaintain.deltaMinMax(seed,
      AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")), G, C, 2)
    assert(stepped.filter(col("needs_rescan")).count() === 0,
      "one extreme-delete must be absorbed by a K=2 reserve")
    assert(rows(MinMaxMaintain.exposedMinMax(
      stepped.drop("needs_rescan"), G, C)) === direct(s2))
  }

  test("losing K+1 extremes exhausts the reserve: exactly that group " +
      "is flagged, and the rescan needs ONLY its rows (behavioral " +
      "proof the step reads O(touched groups))") {
    val s1 = df((1L to 10L).map(i => (i, "hot", Some(i))) ++
      Seq((100L, "cold", Some(7L)), (101L, "cold", Some(3L))))
    // delete values 10, 9, 8 — three extreme-deletes vs K=2
    val s2 = df((1L to 7L).map(i => (i, "hot", Some(i))) ++
      Seq((100L, "cold", Some(7L)), (101L, "cold", Some(3L))))
    val seed = MinMaxMaintain.fullMinMaxState(s1, G, C, 2)
    val stepped = MinMaxMaintain.deltaMinMax(seed,
      AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")), G, C, 2)
    val flagged = stepped.filter(col("needs_rescan"))
      .select("grp").collect().map(_.getString(0)).toSeq
    assert(flagged === Seq("hot"), "exactly the exhausted group flags")
    // feeding rescanMerge a source stripped of every OTHER group's rows
    // must give the identical answer — the rescan provably never looks
    // beyond the flagged groups
    val full = rows(MinMaxMaintain.exposedMinMax(
      MinMaxMaintain.rescanMerge(stepped, s2, G, C, 2), G, C))
    val scopedOnly = rows(MinMaxMaintain.exposedMinMax(
      MinMaxMaintain.rescanMerge(stepped,
        s2.filter(col("grp") === "hot"), G, C, 2), G, C))
    assert(full === scopedOnly)
    assert(full === direct(s2))
  }

  test("watermark discipline across two chained windows: truncation " +
      "raises the floor, tail ops stay invisible, and a later " +
      "exhaustion rescans to the true extreme") {
    val s1 = df(Seq((1L, "g", Some(5L)), (2L, "g", Some(4L)),
      (3L, "g", Some(3L)), (4L, "g", Some(2L))))
    // window 1: delete 5 (reserve hit), insert 1 (tail — below the
    // floor raised to 3 at seed truncation with K=2)
    val s2 = df(Seq((2L, "g", Some(4L)), (3L, "g", Some(3L)),
      (4L, "g", Some(2L)), (5L, "g", Some(1L))))
    val seed = MinMaxMaintain.fullMinMaxState(s1, G, C, 2)
    val r1 = step(seed, s1, s2, 2)
    assert(rows(MinMaxMaintain.exposedMinMax(r1, G, C)) === direct(s2))
    // window 2: delete 4 — hi reserve (now just [4]) empties while the
    // group still has rows; the chained state must flag and rescan
    val s3 = df(Seq((3L, "g", Some(3L)), (4L, "g", Some(2L)),
      (5L, "g", Some(1L))))
    val d2 = MinMaxMaintain.deltaMinMax(r1,
      AggMaintain.diffImages(s2, s3, Seq("pk"), Seq("grp", "v")), G, C, 2)
    assert(d2.filter(col("needs_rescan")).count() === 1,
      "second wave of extreme-deletes must exhaust the K=2 reserve")
    assert(rows(MinMaxMaintain.exposedMinMax(
      MinMaxMaintain.rescanMerge(d2, s3, G, C, 2), G, C)) === direct(s3))
  }

  test("duplicate values carry exact multiplicities: removing one " +
      "copy of the max keeps the max") {
    val s1 = df(Seq((1L, "g", Some(9L)), (2L, "g", Some(9L)),
      (3L, "g", Some(1L))))
    val s2 = df(Seq((2L, "g", Some(9L)), (3L, "g", Some(1L))))
    val stepped = MinMaxMaintain.deltaMinMax(
      MinMaxMaintain.fullMinMaxState(s1, G, C, 1),
      AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")), G, C, 1)
    assert(stepped.filter(col("needs_rescan")).count() === 0,
      "the second copy keeps the K=1 reserve alive")
    assert(rows(MinMaxMaintain.exposedMinMax(
      stepped.drop("needs_rescan"), G, C)) === direct(s2))
  }

  test("table-backed lifecycle: init, windows with in-reserve deletes " +
      "and a reserve-exhausting window, group vanish, replay no-op — " +
      "maintained table equals direct recompute after every step") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mm").toString
    val (srcDir, mmDir) = (s"$base/src", s"$base/mm")
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val snap = ((1L to 10L).map(i => (i, "hot", L(i * 10))) ++
      Seq((20L, "cold", L(7L)), (21L, "cold", null.asInstanceOf[java.lang.Long]),
        (22L, "solo", L(1L)))).toDF("pk", "grp", "v")
    PartitionedUpsert.init(snap, srcDir, "pk", 4)
    MinMaxMaintain.initMinMax(spark, srcDir, mmDir, G, C, k = 2, nBuckets = 2)
    def assertCurrent(): Unit = assert(
      rows(MinMaxMaintain.readMinMax(spark, mmDir)) ===
        direct(PartitionedUpsert.read(spark, srcDir)))
    assertCurrent()
    // window 1: delete the hot max (absorbed by the K=2 reserve), a
    // new cold max, a null flip
    PartitionedUpsert.merge(spark, srcDir,
      Seq((100L, 10L, "d", "hot", null.asInstanceOf[java.lang.Long]),
        (101L, 21L, "u", "cold", L(50L)),
        (102L, 20L, "u", "cold", null.asInstanceOf[java.lang.Long]))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 4)
    val (f1, t1) = MinMaxMaintain.maintainMinMax(spark, srcDir, mmDir, k = 2)
    assert(f1 < t1)
    assertCurrent()
    // window 2: three more hot extreme-deletes — exhausts the reserve,
    // exercising the scoped rescan inside the table-backed step — and
    // the solo group empties
    PartitionedUpsert.merge(spark, srcDir,
      Seq((200L, 9L, "d", "hot", null.asInstanceOf[java.lang.Long]),
        (201L, 8L, "d", "hot", null.asInstanceOf[java.lang.Long]),
        (202L, 7L, "d", "hot", null.asInstanceOf[java.lang.Long]),
        (203L, 22L, "d", "solo", null.asInstanceOf[java.lang.Long]))
        .toDF("lsn", "pk", "op", "grp", "v"),
      "pk", "lsn", "op", Seq("grp", "v"), 4)
    MinMaxMaintain.maintainMinMax(spark, srcDir, mmDir, k = 2)
    assertCurrent()
    assert(!rows(MinMaxMaintain.readMinMax(spark, mmDir))
      .exists(_._1 == "solo"), "emptied group must vanish")
    // replay: already-current step burns no version (metadata no-op)
    val v = PartitionedUpsert.currentManifest(spark, mmDir).get.version
    val (fr, tr) = MinMaxMaintain.maintainMinMax(spark, srcDir, mmDir, k = 2)
    assert(fr === tr)
    assert(PartitionedUpsert.currentManifest(spark, mmDir).get.version === v)
  }

  test("exposedTopK: maintained top-n equals the direct ranked window " +
      "through deletes inside the reserve and a rescan; short groups " +
      "emit fewer rows; n >= 1 and clean-state guards hold") {
    import spark.implicits._
    val s1 = df(Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(10L)), (3L, "a", Some(8L)),
      (4L, "a", Some(7L)), (5L, "a", Some(5L)),
      (6L, "b", Some(3L)),
      (7L, "c", Some(9L)), (8L, "c", Some(6L)), (9L, "c", Some(4L)),
      (10L, "c", Some(2L))))
    // a: one of the duplicate 10s AND the 8 deleted (in-reserve ops);
    // c: top three deleted against K=3 -> exhaustion + rescan
    val s2 = df(Seq(
      (1L, "a", Some(10L)), (4L, "a", Some(7L)), (5L, "a", Some(5L)),
      (6L, "b", Some(3L)),
      (10L, "c", Some(2L))))
    val st = maintained(s1, s2, k = 3)
    val got = MinMaxMaintain.exposedTopK(st, G, "v", n = 2)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rnk"),
        r.getAs[Long]("v"), r.getAs[Long]("m"))).sortBy(t => (t._1, t._2)).toSeq
    val want = s2.filter($"v".isNotNull)
      .groupBy($"grp", $"v").agg(count(lit(1)).as("m"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"grp")
          .orderBy($"v".desc)).cast("long"))
      .filter($"rnk" <= 2)
      .select($"grp", $"rnk", $"v", $"m")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got === want)
    assert(got.count(_._1 == "b") === 1, "a 1-value group emits one row")
    intercept[IllegalArgumentException] {
      MinMaxMaintain.exposedTopK(st, G, "v", n = 0)
    }
    val dirty = MinMaxMaintain.deltaMinMax(
      MinMaxMaintain.fullMinMaxState(s1, G, C, 3),
      AggMaintain.diffImages(s1, s2, Seq("pk"), Seq("grp", "v")), G, C, 3)
    intercept[IllegalArgumentException] {
      MinMaxMaintain.exposedTopK(dirty, G, "v", n = 2)
    }
  }

  test("exposedMinMax refuses a state with unresolved rescan flags") {
    val s1 = df(Seq((1L, "g", Some(1L))))
    val stepped = MinMaxMaintain.deltaMinMax(
      MinMaxMaintain.fullMinMaxState(s1, G, C, 1),
      AggMaintain.diffImages(s1, s1, Seq("pk"), Seq("grp", "v")), G, C, 1)
    intercept[IllegalArgumentException] {
      MinMaxMaintain.exposedMinMax(stepped, G, C)
    }
  }
}
