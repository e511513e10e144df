package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming per-day HLL blob maintenance: estimates stay EXACT below
  * the coupon regime across incremental merges, replays are no-ops at
  * two levels (txn metadata + HLL value idempotence), and the series
  * read path equals the in-query rung's. */
class DauStreamSpec extends SparkSpec {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  // (user_id, ts) waves: day 1 users {1,2,3}, day 2 users {2,3,4,5},
  // day 3 users {1,5} — with in-wave duplicates
  private val wave1 = Seq((1L, ts(1, 1)), (2L, ts(1, 2)), (1L, ts(1, 3)))
  private val wave2 = Seq((3L, ts(1, 9)), (2L, ts(2, 1)), (3L, ts(2, 2)),
    (4L, ts(2, 3)), (5L, ts(2, 4)), (4L, ts(2, 5)))
  private val wave3 = Seq((1L, ts(3, 1)), (5L, ts(3, 2)))

  private def exactDau = Map(1 -> 3L, 2 -> 4L, 3 -> 2L)

  test("streamed blobs: incremental merges across batches give exact " +
      "per-day counts; replayed and duplicate deliveries change nothing") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dau").toString
    val (blobDir, ckpt) = (s"$base/blobs", s"$base/ckpt")
    DauStream.init(spark, blobDir, nBuckets = 4)

    val in = MemoryStream[(Long, Timestamp)]
    val q = DauStream.blobSink(
      in.toDF().toDF("user_id", "ts"), blobDir, ckpt)
    try {
      in.addData(wave1)
      q.processAllAvailable()
      in.addData(wave2) // day-1 tail arrives in a LATER batch
      q.processAllAvailable()
      in.addData(wave3)
      q.processAllAvailable()
    } finally q.stop()

    def dauByDay(): Map[Int, Long] = DauStream.read(spark, blobDir)
      .select(dayofmonth($"d").as("dom"),
        hll_sketch_estimate($"sketch").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dauByDay() === exactDau)

    // value-level idempotence: redeliver EVERY row as a fresh batch
    // (new lsn, new txn version) — same coupons, same estimates
    val all = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts")
    DauStream.mergeBatch(spark, blobDir, all, lsn = 99L)
    assert(dauByDay() === exactDau, "HLL union of re-delivered values moved")

    // txn-level replay: same (app, version) is a metadata no-op — the
    // manifest version must not advance
    val before = graft.ops.cdc.PartitionedUpsert
      .manifestOrFail(spark, blobDir).version
    DauStream.mergeBatch(spark, blobDir, all, lsn = 100L,
      txn = Some(("replay-app", 1L)))
    DauStream.mergeBatch(spark, blobDir, all, lsn = 101L,
      txn = Some(("replay-app", 1L)))
    val after = graft.ops.cdc.PartitionedUpsert
      .manifestOrFail(spark, blobDir).version
    assert(after === before + 1, "replayed txn should not commit again")
  }

  test("series over maintained blobs equals exact trailing windows " +
      "(coupon-exact regime) and matches the in-query read path") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dau2").toString
    val blobDir = s"$base/blobs"
    DauStream.init(spark, blobDir, nBuckets = 4)
    val all = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts")
    DauStream.mergeBatch(spark, blobDir, all, lsn = 1L)

    val rows = DauStream.series(spark, blobDir).collect()
    val byDay = rows.map(r =>
      r.getAs[Timestamp]("d").toLocalDateTime.getDayOfMonth ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau")))
      .toMap
    // exact trailing windows over {d1:{1,2,3}, d2:{2,3,4,5}, d3:{1,5}}
    assert(byDay(1) === ((3L, 3L, 3L)))
    assert(byDay(2) === ((4L, 5L, 5L))) // d1 ∪ d2 = {1,2,3,4,5}
    assert(byDay(3) === ((2L, 5L, 5L))) // d1 ∪ d2 ∪ d3 = 5 users
    // the shared read path: Quality.dauSeries over the same blobs
    val viaShared = graft.ops.cdc.Quality
      .dauSeries(DauStream.read(spark, blobDir)).collect()
    assert(viaShared.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("rebuildDays: a GDPR purge recomputes ONLY the affected days' " +
      "blobs from the post-purge source — counts drop, a day left " +
      "empty disappears, untouched days keep their exact blobs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dau_rb")
      .toString
    val blobDir = s"$base/blobs"
    DauStream.init(spark, blobDir, nBuckets = 4)
    val all = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts")
    DauStream.mergeBatch(spark, blobDir, all, lsn = 1L)
    val day1BlobBefore = DauStream.read(spark, blobDir)
      .filter(dayofmonth($"d") === 1).select($"sketch").head().getAs[Array[Byte]](0)

    // purge user 5 (active on days 2 and 3; day 3 = {1,5})
    val purged = all.filter($"user_id" =!= 5L)
    val affected = all.filter($"user_id" === 5L)
      .select(DauStream.dayOf($"ts").as("d"))
    DauStream.rebuildDays(spark, blobDir, purged, affected, lsn = 2L)

    val dau = DauStream.read(spark, blobDir)
      .select(dayofmonth($"d").as("dom"),
        hll_sketch_estimate($"sketch").as("est"))
      .collect().map(r => r.getAs[Int]("dom") -> r.getAs[Long]("est"))
      .toMap
    assert(dau(2) === 3L) // {2,3,4} after purge
    assert(dau(3) === 1L) // {1}
    assert(dau(1) === 3L) // day 1 untouched
    // untouched day's blob is byte-identical (no needless rewrite)
    val day1BlobAfter = DauStream.read(spark, blobDir)
      .filter(dayofmonth($"d") === 1).select($"sketch").head().getAs[Array[Byte]](0)
    assert(day1BlobAfter.sameElements(day1BlobBefore))

    // purge the only user of a day -> that day's blob is DELETED
    val purged2 = purged.filter($"user_id" =!= 1L)
    DauStream.rebuildDays(spark, blobDir,
      purged2, spark.range(1).select(DauStream.dayOf(lit(ts(3, 0))).as("d")),
      lsn = 3L)
    val days = DauStream.read(spark, blobDir)
      .select(dayofmonth($"d")).as[Int].collect().toSet
    assert(days === Set(1, 2))
  }

  test("non-UTC session timezone: blob day keys still equal " +
      "date_trunc('day', ts) (r14 review: the unix_timestamp DIV 86400 " +
      "key shifted every day by one in positive-offset timezones)") {
    import spark.implicits._
    val priorTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_dau_tz")
        .toString
      DauStream.init(spark, s"$base/blobs", nBuckets = 4)
      val batch = (wave1 ++ wave2 ++ wave3).toDF("user_id", "ts")
      DauStream.mergeBatch(spark, s"$base/blobs", batch, lsn = 1L)
      val blobDays = DauStream.read(spark, s"$base/blobs")
        .select($"d").as[Timestamp].collect().toSet
      val truncDays = batch
        .select(date_trunc("day", $"ts").as("d"))
        .distinct().as[Timestamp].collect().toSet
      assert(blobDays === truncDays)
      // and the estimates land on the right local days
      val dau = DauStream.read(spark, s"$base/blobs")
        .select(dayofmonth($"d").as("dom"),
          hll_sketch_estimate($"sketch").as("est"))
        .collect().map(r => r.getAs[Int]("dom") -> r.getAs[Long]("est"))
        .toMap
      exactDau.foreach { case (dom, n) => assert(dau(dom) === n) }
    } finally spark.conf.set("spark.sql.session.timeZone", priorTz)
  }
}
