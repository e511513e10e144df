package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.SparkSpec

/** Streaming extras: state TTL expiry and Trigger.AvailableNow. */
class StreamingExtrasSpec extends SparkSpec {

  test("transformWithState TTL: counter state expires between batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[CdcStream.Change]
      val out = in.toDS().groupByKey(_.pk)
        .transformWithState(new StateProcessors.TtlCounter(5000), TimeMode.ProcessingTime(),
          OutputMode.Update())
        .toDF("pk", "n")
      val name = s"mem_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      // ProcessingTime time-mode queries never quiesce (TTL cleanup
      // keeps scheduling batches), so poll the sink instead of
      // processAllAvailable()
      def awaitRows(n: Int): Seq[Long] = {
        val deadline = System.nanoTime() + 60e9.toLong
        var rows = Seq.empty[Long]
        while (rows.length < n && System.nanoTime() < deadline) {
          Thread.sleep(200)
          rows = spark.table(name).collect().map(_.getLong(1)).toSeq
        }
        rows
      }
      try {
        val t0 = System.nanoTime()
        in.addData(CdcStream.Change(1L, 1L, "c", 1.0))
        assert(awaitRows(1) === Seq(1L))
        in.addData(CdcStream.Change(1L, 2L, "c", 1.0))
        val second = awaitRows(2)
        val elapsedMs = (System.nanoTime() - t0) / 1000000
        // under parallel-suite load the 5s TTL may lapse even between
        // these two batches — only assert accumulation when it could
        // not have (the unconditional claim is expiry, below)
        if (elapsedMs < 4000)
          assert(second === Seq(1L, 2L), s"after ${elapsedMs}ms: $second")
        Thread.sleep(7000) // let TTL lapse
        in.addData(CdcStream.Change(1L, 3L, "c", 1.0))
        val counts = awaitRows(second.length + 1)
        assert(counts.last === 1L, s"state should have expired: $counts")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("Trigger.AvailableNow drains a file source and stops") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_an").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    (1 to 3).foreach { i =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f$i.json"),
        s"""{"op":"c","after":{"pk":$i,"val":$i.0},"source":{"table":"t","lsn":$i},"ts_ms":${1700000000000L + i}}""")
    }
    val q = CdcStream.source(spark, srcDir, payload)
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query should self-terminate")
    assert(spark.read.parquet(s"$base/out").count() === 3)
  }

  test("partitionedUpsertSink: kill-and-resume is exactly-once (RocksDB + " +
      "changelog checkpointing; stale redelivery suppressed)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      val payload = StructType(Seq(
        StructField("pk", LongType), StructField("val", DoubleType)))
      val base = java.nio.file.Files.createTempDirectory("graft_eo2").toString
      val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
      def env(op: String, pk: Long, v: Double, lsn: Long) =
        s"""{"op":"$op","after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""
      def write(name: String, lines: Seq[String]): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$srcDir/$name"), lines.mkString("\n")): Unit
      def start() = CdcStream.partitionedUpsertSink(
        CdcStream.source(spark, srcDir, payload)
          .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn"),
        s"$base/tgt", s"$base/ckpt", "pk", "lsn", "op", Seq("val"), nBuckets = 4)

      write("a.json", Seq(env("c", 1, 1.0, 1), env("c", 2, 2.0, 2)))
      val q1 = start()
      q1.processAllAvailable()
      write("b.json", Seq(env("u", 1, 7.5, 3), env("d", 2, 0.0, 4)))
      q1.processAllAvailable()
      q1.stop() // kill

      // resume: lsn 3 is REDELIVERED with a stale value — only dedup
      // state recovered from the checkpoint keeps 7.5 in place
      write("c.json", Seq(env("u", 1, 1111.0, 3), env("c", 5, 5.0, 5)))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val state = graft.ops.cdc.PartitionedUpsert.read(spark, s"$base/tgt")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(state === Map(1L -> 7.5, 5L -> 5.0), s"got $state")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("auto-DDL: op='s' events evolve the target INLINE — one continuous " +
      "query, DDL splitting a single micro-batch, no stop/resume choreography") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_addl").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/$name"), lines.mkString("\n")): Unit

    val payloadA = StructType(Seq(
      StructField("pk", LongType), StructField("val", IntegerType)))
    // batch 1: plain data under the initial schema
    write("a.json", Seq(
      """{"op":"c","after":{"pk":1,"val":10},"source":{"table":"t","lsn":1},"ts_ms":1}""",
      """{"op":"c","after":{"pk":2,"val":20},"source":{"table":"t","lsn":2},"ts_ms":2}"""))
    val q = CdcStream.autoDdlUpsertSink(
      CdcStream.rawSource(spark, srcDir),
      s"$base/tgt", s"$base/ckpt", "pk", payloadA, nBuckets = 4)
    try {
      q.processAllAvailable()
      // batch 2 interleaves THREE eras inside one micro-batch: old-schema
      // data (lsn 3), a rename DDL (4), mid-era data (5), a widen DDL
      // (6), then post-widen data (7, 8) with a value beyond int range —
      // the sink must split at both boundaries and evolve inline
      write("b.json", Seq(
        """{"op":"u","after":{"pk":2,"val":25},"source":{"table":"t","lsn":3},"ts_ms":3}""",
        """{"op":"s","ddl":{"rename":{"from":"val","to":"amount"}},"source":{"table":"t","lsn":4},"ts_ms":4}""",
        """{"op":"c","after":{"pk":5,"amount":50},"source":{"table":"t","lsn":5},"ts_ms":5}""",
        """{"op":"s","ddl":{"widen":{"col":"amount","to":"bigint"}},"source":{"table":"t","lsn":6},"ts_ms":6}""",
        """{"op":"u","after":{"pk":1,"amount":3000000000},"source":{"table":"t","lsn":7},"ts_ms":7}""",
        """{"op":"c","after":{"pk":9,"amount":9},"source":{"table":"t","lsn":8},"ts_ms":8}"""))
      q.processAllAvailable()
    } finally q.stop()

    val out = graft.ops.cdc.PartitionedUpsert.read(spark, s"$base/tgt")
    assert(out.schema("amount").dataType === LongType)
    val state = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state === Map(1L -> 3000000000L, 2L -> 25L, 5L -> 50L, 9L -> 9L),
      s"got $state")
    // the DDL commit is visible in the table history: init + batch-1
    // merge + ONE folded rename+widen evolution + batch-2 merge = 4
    // versions (one table rewrite for the whole DDL batch, however
    // many changes it carries)
    val hist = graft.ops.cdc.PartitionedUpsert.history(spark, s"$base/tgt")
    assert(hist.map(_._1) === Seq(4L, 3L, 2L, 1L), s"history: $hist")
  }

  test("streaming document-ingest pipeline: pii-redact + quality-band + " +
      "watermarked exact-dedup, composed from the batch operators") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // the production ingest shape for a training corpus: every stage is
    // the SAME column expression the oracled batch query uses — batch/
    // stream parity by construction, only the dedup becomes stateful
    // (dropDuplicatesWithinWatermark bounds state by the lateness horizon)
    val in = MemoryStream[(Long, String, Timestamp)]
    graft.functions.NormalizeText.register(spark)
    val cleaned = in.toDF().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "10 minutes")
      .withColumn("redacted",
        graft.ops.llm.PiiRedact.redact($"text"))
      .withColumn("n_words", size(split($"redacted", " ")).cast("long"))
      .withColumn("band", when($"n_words" < 5, "short").otherwise("ok"))
      .withColumn("h", sha2(
        graft.functions.NormalizeText.normalize_native($"redacted"), 256))
      .dropDuplicatesWithinWatermark("h")
    val name = s"ingest_${System.nanoTime()}"
    val q = cleaned.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(
        (1L, "reach me at a@b.co about the large corpus cleanup today", t),
        (2L, "reach me at z@y.org about the large corpus cleanup today", t),
        (3L, "tiny doc", t))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select($"doc_id", $"redacted", $"band").collect()
      // doc 1 and 2 redact to the SAME text (<EMAIL> placeholder) →
      // the dedup keeps only the first to arrive; doc 3 is short-banded
      assert(rows.length === 2, rows.mkString(";"))
      val byId = rows.map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
      assert(byId.keySet.intersect(Set(1L, 2L)).size === 1,
        "redaction-equal docs must dedup to one survivor")
      assert(byId.values.forall(!_._1.contains("@")), "emails must be gone")
      assert(byId(3L)._2 === "short")
    } finally q.stop()
  }

  test("cache/persist: cached plan shows InMemoryTableScan and unpersist clears") {
    val df = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .groupBy("l_returnflag").count()
    df.cache()
    try {
      df.count() // materialize
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
    } finally df.unpersist(blocking = true)
    assert(!df.queryExecution.executedPlan.toString.contains("InMemoryTableScan") ||
      spark.sharedState.cacheManager.isEmpty)
  }
}
