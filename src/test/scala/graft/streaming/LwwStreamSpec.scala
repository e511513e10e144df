package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.LwwMerge

/** Multi-master LWW register: convergence against STORED state — the
  * guarantee the oracled q_cdc_merge_multi (one batch, one argmax)
  * cannot exercise: out-of-order cross-site delivery, clock-tie
  * priority against the table, tombstone wins, replay no-ops. */
class LwwStreamSpec extends SparkSpec {

  private def row(pk: Long, ts: Long, prio: Long, lsn: Long, site: String,
                  deleted: Boolean, v: String) =
    (pk, new Timestamp(ts), prio, lsn, site, deleted, v)

  private def mk(rows: Seq[(Long, Timestamp, Long, Long, String, Boolean, String)]) = {
    import spark.implicits._
    rows.toDF("pk", "ts", "prio", "lsn", "site", "deleted", "v")
  }

  private def state(dir: String) =
    LwwMerge.readAll(spark, dir).collect()
      .map(r => r.getAs[Long]("pk") ->
        (r.getAs[String]("site"), r.getAs[Long]("lsn"),
          r.getAs[Boolean]("deleted"), r.getAs[String]("v"))).toMap

  test("out-of-order cross-site delivery converges: older writes never " +
      "clobber stored newer ones; ties resolve by site priority") {
    val dir = java.nio.file.Files.createTempDirectory("lww").toString
    val t = 1700000000000L
    // batch 1: site b's NEWER write for pk=1 arrives first
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 5000, 2, 100, "b", deleted = false, "b-new"),
      row(2, t, 1, 10, "a", deleted = false, "a-first"))),
      "pk", Seq("v"), nBuckets = 4)
    // batch 2: site a's OLDER write for pk=1 arrives late — must lose
    // against the TABLE, plus a clock-TIE on pk=2 (same ts as stored?
    // no — same ts as an in-batch sibling): site b (prio 2) must win
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 1000, 1, 11, "a", deleted = false, "a-late"),
      row(2, t + 9000, 1, 12, "a", deleted = false, "a-tie"),
      row(2, t + 9000, 2, 101, "b", deleted = false, "b-tie"))),
      "pk", Seq("v"), nBuckets = 4)
    val s = state(dir)
    assert(s(1L) === (("b", 100L, false, "b-new")), s"pk1 clobbered: ${s(1L)}")
    assert(s(2L) === (("b", 101L, false, "b-tie")), s"pk2 tie lost: ${s(2L)}")
  }

  test("delivery order is immaterial: permuted batches reach the same state") {
    val t = 1700000000000L
    val writes = Seq(
      row(1, t + 1000, 1, 1, "a", deleted = false, "v1"),
      row(1, t + 3000, 2, 50, "b", deleted = false, "v2"),
      row(1, t + 2000, 1, 2, "a", deleted = false, "v3"),
      row(2, t, 2, 51, "b", deleted = false, "w1"),
      row(2, t, 1, 3, "a", deleted = false, "w2"))
    val states = Seq(writes, writes.reverse, writes.sortBy(_._4)).map { order =>
      val dir = java.nio.file.Files.createTempDirectory("lww_p").toString
      order.foreach(w => LwwMerge.resolveAndMerge(spark, dir, mk(Seq(w)),
        "pk", Seq("v"), nBuckets = 4))
      state(dir)
    }
    assert(states.distinct.size === 1, s"divergent states: $states")
    assert(states.head(1L)._4 === "v2") // latest ts wins
    assert(states.head(2L)._1 === "b")  // tie -> priority
  }

  test("tombstones win and persist: an older write cannot resurrect; " +
      "read() hides them, readAll() keeps them") {
    val dir = java.nio.file.Files.createTempDirectory("lww_t").toString
    val t = 1700000000000L
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 5000, 1, 10, "a", deleted = true, "gone"))),
      "pk", Seq("v"), nBuckets = 4)
    // late older write for the same key — the tombstone must hold
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 1000, 2, 90, "b", deleted = false, "zombie"))),
      "pk", Seq("v"), nBuckets = 4)
    assert(LwwMerge.read(spark, dir).count() === 0L)
    val all = state(dir)
    assert(all(1L)._3 === true && all(1L)._4 === "gone")
  }

  test("reapTombstones: only pre-horizon tombstones go; the documented " +
      "resurrection hazard is real after a premature reap") {
    val dir = java.nio.file.Files.createTempDirectory("lww_gc").toString
    val t = 1700000000000L
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 1000, 1, 10, "a", deleted = true, "old-dead"),
      row(2, t + 900000, 1, 11, "a", deleted = true, "new-dead"),
      row(3, t + 2000, 1, 12, "a", deleted = false, "alive"))),
      "pk", Seq("v"), nBuckets = 4)
    val n = LwwMerge.reapTombstones(spark, dir,
      new Timestamp(t + 500000), nBuckets = 4)
    assert(n === 1L, s"expected exactly the pre-horizon tombstone, got $n")
    val all = state(dir)
    assert(!all.contains(1L), "pre-horizon tombstone must be gone")
    assert(all(2L)._3 === true, "post-horizon tombstone must survive")
    assert(all(3L)._4 === "alive")
    // idempotent: nothing left under the same horizon
    assert(LwwMerge.reapTombstones(spark, dir,
      new Timestamp(t + 500000), nBuckets = 4) === 0L)
    // the hazard the horizon precondition exists to prevent: a
    // pre-horizon write arriving AFTER the reap resurrects the key
    // (the tombstone that would have beaten it is gone) — so the
    // horizon MUST be a true cross-site stability bound
    LwwMerge.resolveAndMerge(spark, dir, mk(Seq(
      row(1, t + 500, 2, 90, "b", deleted = false, "zombie"))),
      "pk", Seq("v"), nBuckets = 4)
    assert(state(dir)(1L)._4 === "zombie",
      "hazard fixture lost — the doc's warning no longer demonstrates")
  }

  test("in-sink reaper cadence: tombstones below a moving stability " +
      "horizon are swept on the trigger cadence, and convergence " +
      "survives permuted post-horizon deliveries") {
    val t = 1700000000000L
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("ts_ms", LongType),
      StructField("prio", LongType), StructField("lsn", LongType),
      StructField("site", StringType), StructField("deleted", BooleanType),
      StructField("v", StringType)))
    def line(pk: Long, ts: Long, prio: Long, lsn: Long, site: String,
             deleted: Boolean, v: String) =
      s"""{"pk":$pk,"ts_ms":$ts,"prio":$prio,"lsn":$lsn,"site":"$site","deleted":$deleted,"v":"$v"}"""
    // pre-horizon wave: a tombstone (pk=1) + a live write (pk=2);
    // post-horizon wave: pk=1 reborn by a NEWER write + a post-horizon
    // tombstone (pk=3) that must SURVIVE the sweep — delivered in two
    // different orders across two runs
    val preWave = Seq(
      line(1, t + 1000, 1, 10, "a", deleted = true, "dead"),
      line(2, t + 2000, 1, 11, "a", deleted = false, "alive"))
    val postWave = Seq(
      line(1, t + 600000, 2, 200, "b", deleted = false, "reborn"),
      line(3, t + 900000, 1, 12, "a", deleted = true, "late-dead"))
    val finals = Seq(postWave, postWave.reverse).map { order =>
      val base = java.nio.file.Files.createTempDirectory("lww_reap").toString
      val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
      val (tDir, ckpt) = (s"$base/target", s"$base/ckpt")
      // the horizon MOVES: None until every site has acked the
      // pre-horizon writes, then a true stability bound
      @volatile var horizon: Option[Timestamp] = None
      def start() = CdcStream.lwwMergeSink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .json(srcDir)
          .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"),
        tDir, ckpt, "pk", Seq("v"), nBuckets = 4,
        reapEvery = 1, stabilityHorizon = () => horizon)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f1.json"), preWave.mkString("\n"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // pre-horizon delivery complete everywhere -> the bound is real
      horizon = Some(new Timestamp(t + 500000))
      order.zipWithIndex.foreach { case (l, i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$srcDir/g$i.json"), l)
      }
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val all = state(tDir)
      // no deleted pre-horizon row may remain stored: swept by the
      // cadence (or superseded by the reborn write first — either way
      // gone)
      assert(LwwMerge.readAll(spark, tDir)
        .filter(col("deleted") &&
          col("ts") < lit(new Timestamp(t + 500000))).count() === 0L,
        "pre-horizon tombstone survived the in-sink sweep")
      assert(all(3L)._3 === true, "post-horizon tombstone must survive the sweep")
      all
    }
    assert(finals.distinct.size === 1,
      s"permuted post-horizon deliveries diverged: $finals")
    assert(finals.head(1L)._4 === "reborn")
    assert(finals.head(2L)._4 === "alive")
  }

  test("txn replay is a metadata no-op; streaming sink resolves " +
      "out-of-order across triggers") {
    val base = java.nio.file.Files.createTempDirectory("lww_s").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (tDir, ckpt) = (s"$base/target", s"$base/ckpt")
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("ts_ms", LongType),
      StructField("prio", LongType), StructField("lsn", LongType),
      StructField("site", StringType), StructField("deleted", BooleanType),
      StructField("v", StringType)))
    val t = 1700000000000L
    def line(pk: Long, ts: Long, prio: Long, lsn: Long, site: String, v: String) =
      s"""{"pk":$pk,"ts_ms":$ts,"prio":$prio,"lsn":$lsn,"site":"$site","deleted":false,"v":"$v"}"""
    // trigger 1: site b newer write; trigger 2: site a's late older one
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      line(7, t + 8000, 2, 200, "b", "newer"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      line(7, t + 1000, 1, 20, "a", "older"))
    val q = CdcStream.lwwMergeSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"),
      tDir, ckpt, "pk", Seq("v"), nBuckets = 4)
    try q.processAllAvailable() finally q.stop()
    val s = state(tDir)
    assert(s(7L) === (("b", 200L, false, "newer")), s"stream clobbered: $s")
    // replaying an already-committed txn no-ops (trigger 1 = batchId 0
    // committed; trigger 2's all-loser batch records no txn BY DESIGN —
    // its replay is safe through resolution idempotence instead)
    val before = graft.ops.cdc.PartitionedUpsert.currentManifest(spark, tDir).get.version
    LwwMerge.resolveAndMerge(spark, tDir, mk(Seq(
      row(7, t + 9999, 2, 201, "b", deleted = false, "replay"))),
      "pk", Seq("v"), nBuckets = 4, txn = Some((ckpt, 0L)))
    val after = graft.ops.cdc.PartitionedUpsert.currentManifest(spark, tDir).get.version
    assert(after === before, "already-committed txn burned a version")
    assert(state(tDir)(7L)._4 === "newer")
    // kill-and-resume: a fresh query on the SAME checkpoint continues —
    // the next trigger still resolves against stored state (a late
    // older site-a write keeps losing after the restart)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(line(7, t + 2000, 1, 21, "a", "older-again"),
        line(8, t + 1000, 1, 22, "a", "fresh-key")).mkString("\n"))
    val q2 = CdcStream.lwwMergeSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"),
      tDir, ckpt, "pk", Seq("v"), nBuckets = 4)
    try q2.processAllAvailable() finally q2.stop()
    val s2 = state(tDir)
    assert(s2(7L)._4 === "newer", "restart lost the stored-ord guarantee")
    assert(s2(8L)._4 === "fresh-key", "post-restart new key missing")
  }
}
