package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSpec

case class Ev(ts: Timestamp, user: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def runBatches[A](input: MemoryStream[A],
                            out: org.apache.spark.sql.DataFrame,
                            mode: OutputMode,
                            batches: Seq[Seq[A]]): Array[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("tumbling window counts + watermark drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = Streams.tumblingCounts(in.toDF(), "ts", "user", "10 minutes", "10 minutes")
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(Ev(t("2024-01-01 00:01:00"), "a", 1.0),
          Ev(t("2024-01-01 00:05:00"), "a", 2.0),
          Ev(t("2024-01-01 00:11:00"), "b", 3.0)),
      // advance watermark far: closes earlier windows
      Seq(Ev(t("2024-01-01 01:00:00"), "c", 4.0)),
      // this row is far behind the watermark → dropped
      Seq(Ev(t("2024-01-01 00:02:00"), "late", 9.9)),
      Seq(Ev(t("2024-01-01 02:00:00"), "c", 5.0))))
    val byKey = rows.map(r => (r.getAs[Timestamp]("w_start").toString, r.getAs[String]("user")) -> r.getAs[Long]("n")).toMap
    assert(byKey(("2024-01-01 00:00:00.0", "a")) === 2L)
    assert(byKey(("2024-01-01 00:10:00.0", "b")) === 1L)
    assert(!rows.exists(_.getAs[String]("user") == "late"))
  }

  test("sliding windows: one event lands in len/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = Streams.slidingCounts(in.toDF(), "ts", "user", "10 minutes", "5 minutes", "10 minutes")
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(Ev(t("2024-01-01 00:07:00"), "a", 1.0)),
      Seq(Ev(t("2024-01-01 03:00:00"), "z", 0.0))))
    assert(rows.count(_.getAs[String]("user") == "a") === 2)
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = Streams.sessionCounts(in.toDF(), "ts", "user", "30 minutes", "10 minutes")
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(Ev(t("2024-01-01 00:00:00"), "a", 1.0),
          Ev(t("2024-01-01 00:20:00"), "a", 1.0),   // same session
          Ev(t("2024-01-01 02:00:00"), "a", 1.0)),  // new session
      Seq(Ev(t("2024-01-01 06:00:00"), "z", 0.0))))
    val a = rows.filter(_.getAs[String]("user") == "a")
    assert(a.length === 2)
    assert(a.map(_.getAs[Long]("n")).sorted.toSeq === Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark keeps first per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = Streams.dedupWithinWatermark(in.toDF(), "ts", Seq("user"), "10 minutes")
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(Ev(t("2024-01-01 00:00:00"), "a", 1.0),
          Ev(t("2024-01-01 00:01:00"), "a", 2.0),
          Ev(t("2024-01-01 00:01:00"), "b", 3.0))))
    assert(rows.count(_.getAs[String]("user") == "a") === 1)
    assert(rows.count(_.getAs[String]("user") == "b") === 1)
  }

  test("stream-static enrichment joins the broadcast dim per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("a", "Alpha"), ("b", "Beta")).toDF("k", "name")
    val in = MemoryStream[Ev]
    val out = Streams.enrichWithDim(in.toDF(), dim, "user", "k")
      .select($"user", $"name", $"value")
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(Ev(t("2024-01-01 00:00:00"), "a", 1.0),
          Ev(t("2024-01-01 00:00:00"), "x", 2.0))))
    val m = rows.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m("a") === Some("Alpha") && m("x") === None)
  }

  test("stream-stream interval join matches within the bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val left = l.toDF().select($"ts".as("l_ts"), $"user".as("k"), $"value".as("l_v"))
    val right = r.toDF().select($"ts".as("r_ts"), $"user".as("k2"), $"value".as("r_v"))
    val joined = {
      val lw = left.withWatermark("l_ts", "1 hour")
      val rw = right.withWatermark("r_ts", "1 hour")
      lw.join(rw, $"k" === $"k2" &&
        $"r_ts" >= $"l_ts" && $"r_ts" <= $"l_ts" + expr("INTERVAL 10 MINUTES"))
    }
    val name = s"mem_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      l.addData(Ev(t("2024-01-01 00:00:00"), "a", 1.0))
      r.addData(
        Ev(t("2024-01-01 00:05:00"), "a", 2.0),   // in bound
        Ev(t("2024-01-01 00:30:00"), "a", 3.0))   // out of bound
      q.processAllAvailable()
      val rows = spark.table(name).collect()
      assert(rows.length === 1 && rows.head.getAs[Double]("r_v") === 2.0)
    } finally q.stop()
  }

  test("transactionalBuffer: events release only at their commit marker") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    // timeout 0 = NoTimeout mode, so processAllAvailable quiesces
    val out = CdcStream.transactionalBuffer(in.toDS(), abandonedTimeoutMs = 0).toDF()
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      // tx a: two events + marker in one batch → released, lsn-ordered
      Seq(CdcStream.TxEvent("a", 2L, 1L, "u", 11.0),
          CdcStream.TxEvent("a", 1L, 2L, "c", 20.0),
          CdcStream.TxEvent("a", 3L, -1L, "t", 0.0),
          // tx b: no marker yet → withheld
          CdcStream.TxEvent("b", 4L, 3L, "u", 99.0)),
      // tx b commits in a LATER batch → both its events release together
      Seq(CdcStream.TxEvent("b", 5L, 4L, "c", 40.0),
          CdcStream.TxEvent("b", 6L, -1L, "t", 0.0))))
    val byTx = rows.map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(byTx("a").map(_._2).toSeq === Seq(1L, 2L), "tx a releases lsn-ordered")
    assert(byTx("b").map(_._2).toSeq.sorted === Seq(4L, 5L),
      "tx b releases only after its marker")
    assert(!rows.exists(_.getString(3) == "t"), "markers are not emitted")
  }

  test("transactionalBuffer: an oversized tx trips the cap, flushes in lsn " +
      "order, streams the remainder, and still releases everything once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val overflows = spark.sparkContext.longAccumulator("txOverflows")
    val out = CdcStream.transactionalBuffer(in.toDS(), abandonedTimeoutMs = 0,
      maxBufferedEvents = 3, overflowCounter = Some(overflows)).toDF()
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      // 4 events > cap 3 → overflow flush (lsn-ordered), counter bumps
      Seq(CdcStream.TxEvent("big", 4L, 4L, "u", 4.0),
          CdcStream.TxEvent("big", 2L, 2L, "u", 2.0),
          CdcStream.TxEvent("big", 3L, 3L, "u", 3.0),
          CdcStream.TxEvent("big", 1L, 1L, "c", 1.0)),
      // post-overflow events stream through as they arrive
      Seq(CdcStream.TxEvent("big", 5L, 5L, "u", 5.0)),
      // the marker closes the tx; a small tx in the same batch is
      // unaffected by big's overflow (caps are per-tx)
      Seq(CdcStream.TxEvent("big", 6L, -1L, "t", 0.0),
          CdcStream.TxEvent("small", 7L, 9L, "c", 9.0),
          CdcStream.TxEvent("small", 8L, -1L, "t", 0.0))))
    val big = rows.filter(_.getString(0) == "big").map(_.getLong(1)).toSeq
    assert(big.take(4) === Seq(1L, 2L, 3L, 4L),
      s"overflow flush must release buffered events lsn-ordered: $big")
    assert(big.sorted === Seq(1L, 2L, 3L, 4L, 5L),
      s"every event releases exactly once: $big")
    assert(rows.filter(_.getString(0) == "small").map(_.getLong(1)).toSeq === Seq(7L))
    assert(!rows.exists(_.getString(3) == "t"), "markers are not emitted")
    assert(overflows.value === 1L, "the cap engagement must be observable")
  }

  test("transactionalBuffer: an overflowed tx that is then ABANDONED is " +
      "counted as a corruption signal at timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val overflows = spark.sparkContext.longAccumulator("ovf")
    val abandoned = spark.sparkContext.longAccumulator("ovfAbandoned")
    val out = CdcStream.transactionalBuffer(in.toDS(),
      abandonedTimeoutMs = 1500, maxBufferedEvents = 1,
      overflowCounter = Some(overflows),
      abandonedOverflowCounter = Some(abandoned)).toDF()
    val name = s"txab_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // ProcessingTime-timeout queries never quiesce, so POLL the
      // accumulators instead of processAllAvailable (TtlCounter
      // precedent above)
      def await(cond: => Boolean): Boolean = {
        val deadline = System.nanoTime() + 60e9.toLong
        while (!cond && System.nanoTime() < deadline) Thread.sleep(500)
        cond
      }
      // overflow tx "leak": 2 events > cap 1 → its prefix streams out
      in.addData(CdcStream.TxEvent("leak", 1L, 1L, "c", 1.0),
        CdcStream.TxEvent("leak", 2L, 2L, "u", 2.0))
      assert(await(overflows.value >= 1L), "cap must trip")
      assert(abandoned.value === 0L, "not abandoned yet")
      // no marker ever arrives — the timeout lapses and the engine's
      // own cleanup batches fire the expiry
      assert(await(abandoned.value >= 1L),
        "an abandoned overflowed tx must be counted as a corruption signal")
    } finally q.stop()
  }

  test("transactionalBuffer: events redelivered AFTER their commit marker " +
      "hit the tombstone and are dropped, not re-buffered forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.TxEvent]
    val out = CdcStream.transactionalBuffer(in.toDS(), abandonedTimeoutMs = 0).toDF()
    val rows = runBatches(in, out, OutputMode.Append(), Seq(
      Seq(CdcStream.TxEvent("a", 1L, 1L, "c", 1.0),
          CdcStream.TxEvent("a", 2L, -1L, "t", 0.0)),
      // connector restart redelivers lsn 1 after its marker was seen:
      // without the tombstone this re-opens state waiting for a second
      // marker that never comes (leak) — with it, the event is dropped
      Seq(CdcStream.TxEvent("a", 1L, 1L, "c", 1.0)),
      Seq(CdcStream.TxEvent("b", 3L, 2L, "c", 2.0),
          CdcStream.TxEvent("b", 4L, -1L, "t", 0.0))))
    val byTx = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(byTx("a") === Seq(1L), s"redelivery must not duplicate: ${byTx("a")}")
    assert(byTx("b") === Seq(3L))
  }

  test("flatMapGroupsWithState: running CDC state with tombstones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcStream.Change]
    val out = CdcStream.runningState(in.toDS()).toDF()
    val rows = runBatches(in, out, OutputMode.Update(), Seq(
      Seq(CdcStream.Change(1L, 1L, "c", 10.0), CdcStream.Change(2L, 2L, "c", 20.0)),
      Seq(CdcStream.Change(1L, 3L, "u", 11.0)),
      Seq(CdcStream.Change(1L, 2L, "u", 99.0)),   // stale lsn → ignored
      Seq(CdcStream.Change(2L, 4L, "d", 0.0))))   // tombstone
    val m = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m === Set((1L, 1L), (2L, 2L), (1L, 3L), (2L, 4L)))
    val finalFor2 = rows.filter(r => r.getLong(0) == 2L && r.getLong(1) == 4L).head
    assert(finalFor2.isNullAt(2)) // tombstone emits None
  }

  test("transformWithState (RocksDB provider): per-key latest state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[CdcStream.Change]
      // runningStateTws: SAME output contract as the fMGWS
      // runningState (StateOut; tombstone = null value, r15 — the
      // earlier NaN marker conflated a genuine NaN payload)
      val out = CdcStream.runningStateTws(in.toDS()).toDF()
      val rows = runBatches(in, out, OutputMode.Update(), Seq(
        Seq(CdcStream.Change(7L, 1L, "c", 5.0)),
        Seq(CdcStream.Change(7L, 2L, "u", 6.0)),
        Seq(CdcStream.Change(7L, 3L, "d", 0.0))))
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((7L, 1L), (7L, 2L), (7L, 3L)))
      assert(rows.find(_.getLong(1) == 3L).get.isNullAt(2))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("CDC file source + foreachBatch upsert sink reaches correct end state") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    def envLine(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","before":null,"after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(envLine("c", 1, 1.0, 1), envLine("c", 2, 2.0, 2)).mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(envLine("u", 1, 1.5, 3), envLine("d", 2, 0.0, 4),
          envLine("c", 3, 3.0, 5)).mkString("\n"))
    val changes = CdcStream.source(spark, srcDir, payload)
      .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn")
      // deletes carry only before-image; recover pk from lsn pairing:
      // envelope fixture writes after for all ops, so pk is present
    val q = CdcStream.upsertSink(changes, s"$base/target", s"$base/ckpt",
      Seq("pk"), Seq("val"))
    try q.processAllAvailable() finally q.stop()
    val state = graft.ops.cdc.PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state === Map(1L -> 1.5, 3L -> 3.0))
  }

  test("upsertSink: a crash mid-batch leaves the pre-batch state fully " +
      "readable, and the restarted sink converges") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.PartitionedUpsert
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_crash").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    def envLine(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","before":null,"after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(envLine("c", 1, 1.0, 1), envLine("c", 2, 2.0, 2)).mkString("\n"))
    def changes = CdcStream.source(spark, srcDir, payload)
      .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn")
    def start() = CdcStream.upsertSink(changes, s"$base/target",
      s"$base/ckpt", Seq("pk"), Seq("val"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val preBatch = PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(preBatch === Map(1L -> 1.0, 2L -> 2.0))
    // crash injection: the next batch's merge dies AFTER staging its
    // data files but BEFORE the manifest commit — exactly the window
    // where the legacy double-overwrite sink tore the target
    val crashedBatch = Seq((3L, 1L, "u", 9.9), (4L, 5L, "c", 5.0))
      .toDF("lsn", "pk", "op", "val")
    val pending = PartitionedUpsert.prepare(spark, s"$base/target",
      crashedBatch, "pk", "lsn", "op", Seq("val"), nBuckets = 16)
    assert(new java.io.File(s"$base/target/data/${pending.staging}").exists(),
      "the crashed batch's staged files should be on disk")
    val afterCrash = PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(afterCrash === preBatch,
      "pre-batch state must stay fully readable through a mid-batch crash")
    // the restarted sink replays the events through the same checkpoint
    // and converges (idempotent last-write-wins merge)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(envLine("u", 1, 9.9, 3), envLine("c", 5, 5.0, 4)).mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val recovered = PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recovered === Map(1L -> 9.9, 2L -> 2.0, 5L -> 5.0))
  }

  test("upsertSink delete-only fast path: an all-delete micro-batch " +
      "commits merge-on-read tombstones (no bucket rewrite), a later " +
      "mixed batch merges normally and deletes hold") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.PartitionedUpsert
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_mor_sink").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    def envLine(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","before":null,"after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(envLine("c", 1, 1.0, 1), envLine("c", 2, 2.0, 2),
          envLine("c", 3, 3.0, 3)).mkString("\n"))
    def changes = CdcStream.source(spark, srcDir, payload)
      .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn")
    def start() = CdcStream.upsertSink(changes, s"$base/target",
      s"$base/ckpt", Seq("pk"), Seq("val"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val bucketsBefore = PartitionedUpsert.manifestOrFail(
      spark, s"$base/target").buckets
    // retention window: DELETES ONLY → tombstone commit, no rewrite
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(envLine("d", 1, 0.0, 4), envLine("d", 3, 0.0, 5)).mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val m = PartitionedUpsert.manifestOrFail(spark, s"$base/target")
    assert(m.buckets == bucketsBefore,
      "an all-delete window must not move a single data path")
    assert(m.tombs.nonEmpty, "the delete window commits sidecars")
    assert(m.txns.get(s"$base/ckpt").contains(1L),
      "the tombstone commit carries the exactly-once txn cursor")
    assert(PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(2L -> 2.0))
    // mixed window: ordinary merge; tombstoned keys stay dead unless
    // the batch itself re-inserts them
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(envLine("u", 2, 2.5, 6), envLine("c", 4, 4.0, 7)).mkString("\n"))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(2L -> 2.5, 4L -> 4.0))
  }

  test("partitionedUpsertSink auto-compaction: every N batches the " +
      "sink compacts fragmented buckets; contents identical, file " +
      "counts bounded") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.PartitionedUpsert
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_autoc").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    def envLine(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","before":null,"after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
    // pre-fragment the table: a many-partition init snapshot writes
    // each bucket from several tasks (a merge REWRITES its touched
    // buckets and therefore self-compacts them — the fragmentation a
    // long-running table carries lives in the buckets writes spread
    // across tasks, here simulated at init)
    PartitionedUpsert.init(
      (1L to 100L).map(k => (k, k.toDouble)).toDF("pk", "val")
        .repartition(8),
      s"$base/target", "pk", 4)
    val fragmented = PartitionedUpsert.stats(spark, s"$base/target")
    assert(fragmented.exists(_._2 > 1),
      s"fixture must start fragmented, got $fragmented")
    // two single-file triggers on fresh keys (order-independent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f0.json"),
      envLine("c", 201, 1.0, 1))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      envLine("c", 202, 2.0, 2))
    val q = CdcStream.partitionedUpsertSink(
      CdcStream.source(spark, srcDir, payload)
        .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn"),
      s"$base/target", s"$base/ckpt", "pk", "lsn", "op", Seq("val"),
      nBuckets = 4, compactEvery = 1, compactMaxFiles = 1)
    try q.processAllAvailable() finally q.stop()
    val state = PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.size == 102 && state(201L) == 1.0 && state(202L) == 2.0 &&
      state(50L) == 50.0, s"contents preserved through compaction")
    // the cadence healed fragmentation the sink didn't cause: every
    // bucket is at the 1-file budget
    val stats = PartitionedUpsert.stats(spark, s"$base/target")
    assert(stats.forall(_._2 <= 1),
      s"auto-compaction should bound per-bucket files, got $stats")
  }

  test("partitionedUpsertSink quarantine: a poison row violating a " +
      "table CHECK constraint dead-letters with its constraint name " +
      "instead of killing the query; deletes are exempt; without " +
      "quarantine the batch aborts") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.PartitionedUpsert
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_quar").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    // pre-created table carrying the constraint (lazy-init tables
    // start constraint-free)
    PartitionedUpsert.init(
      Seq((100L, 5.0)).toDF("pk", "val"), s"$base/target", "pk", 4)
    PartitionedUpsert.addCheckConstraint(spark, s"$base/target",
      "val_pos", "val > 0")
    def envLine(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","before":null,"after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(envLine("c", 1, 1.0, 1), envLine("c", 2, -2.0, 2),
          envLine("d", 100, -9.0, 3)).mkString("\n"))
    def changes = CdcStream.source(spark, srcDir, payload)
      .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn")
    val q = CdcStream.partitionedUpsertSink(changes, s"$base/target",
      s"$base/ckpt", "pk", "lsn", "op", Seq("val"), nBuckets = 4,
      quarantineDir = Some(s"$base/dlq"))
    try q.processAllAvailable() finally q.stop()
    // the query survived; clean rows merged, the delete applied
    assert(PartitionedUpsert.read(spark, s"$base/target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 1.0))
    val dlq = spark.read.parquet(s"$base/dlq")
    val rows = dlq.select("pk", "__violation", "__batch_id").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 2L && rows(0).getString(1) == "val_pos")
    // without quarantine: the same poison aborts the batch and the
    // table keeps its pre-batch state
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(envLine("c", 7, -7.0, 4)).mkString("\n"))
    val q2 = CdcStream.partitionedUpsertSink(changes, s"$base/target",
      s"$base/ckpt2", "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination()
    }
    q2.stop()
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(died).contains("val_pos"))
    assert(PartitionedUpsert.read(spark, s"$base/target")
      .filter($"pk" === 7L).isEmpty)
  }

  test("partitionedUpsertSink(sparse): TOAST-style partial updates keep " +
      "untouched columns across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.{Cdc, PartitionedUpsert}
    val base = java.nio.file.Files.createTempDirectory("graft_sparse_sink").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    def line(op: String, pk: Long, lsn: Long, after: String) =
      s"""{"op":"$op","pk":$pk,"lsn":$lsn,"after":$after}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(line("c", 1, 1, """{"v":1.5,"lbl":"A"}"""),
        line("c", 2, 2, """{"v":2.0,"lbl":"B"}""")).mkString("\n"))
    // batch 2 arrives AFTER batch 1 committed: the sparse update must
    // merge against STORED state, not within-batch state
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(line("u", 1, 3, """{"v":9.5}"""),        // lbl ABSENT → kept
        line("u", 2, 4, """{"lbl":null}""")).mkString("\n")) // explicit NULL
    val sch = StructType(Seq(StructField("op", StringType),
      StructField("pk", LongType), StructField("lsn", LongType),
      StructField("after", StringType)))
    val raw = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).json(srcDir)
    val (v, vp) = Cdc.sparseField($"after", "v", DoubleType)
    val (l, lp) = Cdc.sparseField($"after", "lbl", StringType)
    val changes = raw.select($"pk", $"lsn", $"op", v.as("v"),
      vp.as("v_present"), l.as("lbl"), lp.as("lbl_present"))
    val q = CdcStream.partitionedUpsertSink(changes, s"$base/tgt",
      s"$base/ckpt", "pk", "lsn", "op", Seq("v", "lbl"), 4, sparse = true)
    try q.processAllAvailable() finally q.stop()
    val state = PartitionedUpsert.read(spark, s"$base/tgt").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(state(1L) === (Some(9.5), Some("A")),
      "absent lbl must survive the partial update")
    assert(state(2L) === (Some(2.0), None),
      "explicit null must SET null while absent v survives")
  }

  test("sparse quarantine evaluates the MERGED per-key image (r16 " +
      "ADVICE): a partial after-image whose absent column passes the " +
      "raw row check but whose post-merge state violates diverts the " +
      "key instead of aborting the query") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.ops.cdc.{Cdc, PartitionedUpsert}
    val base = java.nio.file.Files.createTempDirectory("graft_sparse_quar").toString
    val srcDir = s"$base/changes"; new java.io.File(srcDir).mkdirs()
    // table with a TWO-column constraint: the sparse poison shape —
    // an event touching only `cap` carries v=NULL raw (row check
    // passes vacuously) while the merged state v=5 > cap=3 violates
    PartitionedUpsert.init(
      Seq((1L, 5.0, 10.0), (2L, 2.0, 10.0)).toDF("pk", "v", "cap"),
      s"$base/tgt", "pk", 4)
    PartitionedUpsert.addCheckConstraint(spark, s"$base/tgt",
      "v_cap", "v <= cap")
    def line(op: String, pk: Long, lsn: Long, after: String) =
      s"""{"op":"$op","pk":$pk,"lsn":$lsn,"after":$after}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(line("u", 1, 1, """{"cap":3.0}"""),  // merged 5>3: POISON
        line("u", 2, 2, """{"v":4.0}""")       // merged 4<=10: clean
      ).mkString("\n"))
    val sch = StructType(Seq(StructField("op", StringType),
      StructField("pk", LongType), StructField("lsn", LongType),
      StructField("after", StringType)))
    val raw = spark.readStream.schema(sch).json(srcDir)
    val (v, vp) = Cdc.sparseField($"after", "v", DoubleType)
    val (c, cp) = Cdc.sparseField($"after", "cap", DoubleType)
    val changes = raw.select($"pk", $"lsn", $"op", v.as("v"),
      vp.as("v_present"), c.as("cap"), cp.as("cap_present"))
    val q = CdcStream.partitionedUpsertSink(changes, s"$base/tgt",
      s"$base/ckpt", "pk", "lsn", "op", Seq("v", "cap"), 4, sparse = true,
      quarantineDir = Some(s"$base/dlq"))
    try q.processAllAvailable() finally q.stop() // must SURVIVE
    val state = PartitionedUpsert.read(spark, s"$base/tgt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(state(1L) === ((5.0, 10.0)),
      "the violating key keeps its committed state")
    assert(state(2L) === ((4.0, 10.0)), "the clean sparse update applies")
    val dlq = spark.read.parquet(s"$base/dlq")
      .select("pk", "__violation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dlq === Seq((1L, "v_cap")))
  }

  test("exactly-once parquet sink: checkpointed restart does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val in = MemoryStream[Ev]
    def start() = in.toDF().writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    in.addData(Ev(t("2024-01-01 00:00:00"), "a", 1.0))
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    in.addData(Ev(t("2024-01-01 00:01:00"), "b", 2.0))
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() === 2)
    assert(out.select("user").as[String].collect().sorted.toSeq === Seq("a", "b"))
  }
}
