package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** `readStream.format("graft")` — the CDF-backed MicroBatchStream
  * (r15 verdict missing-#2, crossed boundary): offsets are manifest
  * versions, batches are spooled window diffs, executor-side readers,
  * exactly-once under kill-and-resume against a checkpointed sink.
  * Merges here touch DISJOINT keys per version so the stream's
  * content is window-split-invariant (a collapsed window equals the
  * concatenation of per-version diffs) — the assertion can then
  * compare against the batch CDF regardless of how triggers landed. */
class GraftCdfStreamSpec extends SparkSpec {

  private def initTable(dir: String): Unit = {
    import spark.implicits._
    PartitionedUpsert.init(
      (1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
  }

  private def mergeKeys(dir: String, lsn: Long, rows: Seq[(Long, Long)],
                        op: String = "u"): Unit = {
    import spark.implicits._
    PartitionedUpsert.merge(spark, dir,
      rows.map { case (k, v) => (lsn, k, op, v) }.toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4): Unit
  }

  private def sinkRows(path: String): Seq[(Long, String, Long)] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("change_type")),
        if (r.isNullAt(r.fieldIndex("v"))) -1L else r.getLong(r.fieldIndex("v"))))
      .toSeq.sorted

  private def cdfRows(df: DataFrame): Seq[(Long, String, Long)] =
    df.collect()
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("change_type")),
        if (r.isNullAt(r.fieldIndex("v"))) -1L else r.getLong(r.fieldIndex("v"))))
      .toSeq.sorted

  test("kill-and-resume: the stream delivers exactly the batch CDF " +
      "rows, once, across a restart; spool windows are reclaimed on " +
      "commit") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdfstream").toString
    val dir = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    initTable(dir) // v1 (baseline)
    mergeKeys(dir, 100L, Seq((1L, 11L), (11L, 110L))) // v2: update k=1, insert k=11
    mergeKeys(dir, 101L, Seq((2L, 0L)), op = "d")     // v3: delete k=2

    def start() = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill
    assert(sinkRows(out) ==
      cdfRows(PartitionedUpsert.changesBetween(spark, dir, 1L, 3L)))

    // more commits while the stream is DOWN (disjoint keys again)
    mergeKeys(dir, 102L, Seq((3L, 33L), (12L, 120L))) // v4
    mergeKeys(dir, 103L, Seq((4L, 0L)), op = "d")     // v5

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // exactly-once: old rows not re-delivered, new window appended —
    // disjoint keys make collapsed-vs-split windows content-identical
    val expected = (
      cdfRows(PartitionedUpsert.changesBetween(spark, dir, 1L, 3L)) ++
      cdfRows(PartitionedUpsert.changesBetween(spark, dir, 3L, 5L))).sorted
    assert(sinkRows(out) == expected)

    // re-running with nothing new appends nothing
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(sinkRows(out) == expected)

    // committed spool windows were reclaimed (at most the live window
    // survives — commit(end) runs after each durable batch)
    val spoolRoot = new org.apache.hadoop.fs.Path(s"$ckpt/sources/0/graft-spool")
    val fs = spoolRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftover =
      if (!fs.exists(spoolRoot)) 0 else fs.listStatus(spoolRoot).length
    assert(leftover <= 1, s"spool must be reclaimed on commit, found $leftover")
  }

  test("a schema change mid-stream fails the stream loudly (one-schema-" +
      "era CDF contract) — restart from the post-evolution version") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdfevo").toString
    val dir = s"$base/tbl"
    initTable(dir)
    mergeKeys(dir, 100L, Seq((1L, 11L))) // v2
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    // metadata-only add bumps the version and changes the schema era
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(graft.ops.cdc.Cdc.AddColumn("extra",
        org.apache.spark.sql.types.LongType)), "k", 4)
    val e = intercept[Exception] { q.processAllAvailable() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("schema changed")), msgs(e).mkString("~"))
    q.stop()
  }

  test("endingVersion is rejected on the stream path (batch-only option)") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdfend").toString
    val dir = s"$base/tbl"
    initTable(dir)
    mergeKeys(dir, 100L, Seq((1L, 11L))) // v2 — so a window exists to plan
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("endingVersion", "2")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(msgs(e).exists(_.contains("batch-read option")), msgs(e).mkString("~"))
    q.stop()
  }

  test("column pruning reaches the spool: a k-only projection spools " +
      "and serves one-field rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdfprune").toString
    val dir = s"$base/tbl"
    initTable(dir)
    mergeKeys(dir, 100L, Seq((1L, 11L), (11L, 110L))) // v2
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .select("k") // prune to the key
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$base/out")
    assert(got.columns.toSeq == Seq("k"))
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 11L))
  }

  test("startingVersion=snapshot (r16 #5): first batch serves the " +
      "pinned snapshot as inserts, then the tail — exactly-once " +
      "across a restart; equals snapshot+diff composed by hand") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdfsnap").toString
    val dir = s"$base/tbl"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    initTable(dir)                                    // v1
    mergeKeys(dir, 100L, Seq((1L, 11L)))              // v2 — baseline pin
    def start() = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "snapshot")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    q1.processAllAvailable()
    // the first batch is v2's whole state as insert records
    val snapExpected = PartitionedUpsert.read(spark, dir).collect()
      .map(r => (r.getLong(0), "insert", r.getLong(1))).toSeq.sorted
    assert(sinkRows(out) == snapExpected)
    // tail while live
    mergeKeys(dir, 101L, Seq((2L, 22L), (12L, 120L))) // v3
    q1.processAllAvailable()
    q1.stop()
    // kill-and-resume: changes while down, no snapshot re-emit
    mergeKeys(dir, 102L, Seq((3L, 0L)), op = "d")     // v4
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val expected = (snapExpected ++
      cdfRows(PartitionedUpsert.changesBetween(spark, dir, 2L, 4L))).sorted
    assert(sinkRows(out) == expected,
      "snapshot-then-tail must equal snapshot ++ changesBetween, once")
    // batch read rejects the streaming-only option
    val eb = intercept[Exception] {
      spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "snapshot")
        .load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Seq(Option(x.getMessage).getOrElse("")) ++ msgs(x.getCause))
    assert(msgs(eb).exists(_.contains("STREAMING option")),
      msgs(eb).mkString("~"))
  }

  test("startingVersion=afterEvolve (r16 #7): the paved era restart — " +
      "resumes from the latest schema-era start under a fresh " +
      "checkpoint; the old era's tail batch-drains in the old schema, " +
      "nothing lost or duplicated across the seam") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cdfevo2").toString
    val dir = s"$base/tbl"
    initTable(dir)                                    // v1
    mergeKeys(dir, 100L, Seq((1L, 11L)))              // v2 — delivered
    val q1 = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$base/out1")
      .option("checkpointLocation", s"$base/ckpt1")
      .start()
    q1.processAllAvailable() // delivered through v2
    q1.stop()
    mergeKeys(dir, 101L, Seq((2L, 22L)))              // v3 — old era, undelivered
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(graft.ops.cdc.Cdc.AddColumn("extra",
        org.apache.spark.sql.types.LongType)), "k", 4) // v4 — era start
    // v5 — new era change
    PartitionedUpsert.merge(spark, dir,
      Seq((102L, 5L, "u", 55L, 7L)).toDF("lsn", "k", "op", "v", "extra"),
      "k", "lsn", "op", Seq("v", "extra"), 4): Unit
    assert(PartitionedUpsert.latestSchemaEraStart(spark, dir) == 4L)
    // no-loss drain of the old era's undelivered tail, old schema
    val drained = cdfRows(
      PartitionedUpsert.changesBetween(spark, dir, 2L, 3L))
    assert(drained == Seq((2L, "update", 22L)))
    // paved restart: afterEvolve + FRESH checkpoint, new-era schema
    val q2 = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "afterEvolve")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$base/out2")
      .option("checkpointLocation", s"$base/ckpt2")
      .start()
    q2.processAllAvailable()
    q2.stop()
    val newEra = spark.read.parquet(s"$base/out2")
      .select("k", "change_type", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(newEra == Seq((5L, "update", 55L, 7L)),
      "afterEvolve must deliver exactly the new era's tail, new schema")
  }
}
