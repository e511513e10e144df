package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** `df.writeStream.format("graft")` — the native streaming write
  * (r16 verdict #1, the last face of the format): exactly-once under
  * kill-and-resume, replayed epochs burn no version AND skip the
  * batch plan, CDC-shaped streams via opCol/lsnCol, Complete mode as
  * atomic replace. */
class GraftStreamingSinkSpec extends SparkSpec {

  private def initTable(dir: String): Unit = {
    import spark.implicits._
    PartitionedUpsert.init(
      (1L to 8L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
  }

  private def tableState(dir: String): Map[Long, Long] =
    PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("k")) -> r.getLong(r.fieldIndex("v")))
      .toMap

  private def version(dir: String): Long =
    PartitionedUpsert.manifestOrFail(spark, dir).version

  private def writeJsonl(path: String, rows: Seq[(Long, Long)]): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, rows.map { case (k, v) =>
      s"""{"k":$k,"v":$v}""" }.mkString("\n").getBytes("UTF-8")): Unit
  }

  private val jsonSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  test("kill-and-resume over a file source: final state matches the " +
      "foreachBatch upsert reference, one version per non-empty epoch") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val dir = s"$base/tbl"; val in = s"$base/in"; val ckpt = s"$base/ckpt"
    initTable(dir) // v1
    // reference table driven by the ESTABLISHED foreachBatch recipe
    val refDir = s"$base/ref"
    initTable(refDir)

    def start() = spark.readStream.schema(jsonSchema)
      .option("maxFilesPerTrigger", "1") // source option: one file = one epoch
      .json(in)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)

    writeJsonl(s"$in/f1.jsonl", Seq((1L, 111L), (9L, 90L)))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill
    assert(tableState(dir) ==
      (1L to 8L).map(k => k -> k * 10L).toMap + (1L -> 111L) + (9L -> 90L))
    assert(version(dir) == 2L)

    // two more files while the stream is DOWN; resume replays nothing
    writeJsonl(s"$in/f2.jsonl", Seq((2L, 222L)))
    writeJsonl(s"$in/f3.jsonl", Seq((9L, 99L), (10L, 100L)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // reference: the same three files as three foreachBatch merges
    import spark.implicits._
    Seq(Seq((1L, 111L), (9L, 90L)), Seq((2L, 222L)),
        Seq((9L, 99L), (10L, 100L))).zipWithIndex.foreach { case (rows, i) =>
      val m = PartitionedUpsert.manifestOrFail(spark, refDir)
      PartitionedUpsert.merge(spark, refDir,
        rows.toDF("k", "v").select(lit("u").as("op"),
          lit(m.version + 1).as("lsn"), col("k"), col("v")),
        "k", "lsn", "op", Seq("v"), 4, txn = Some("ref" -> i.toLong)): Unit
    }
    assert(tableState(dir) == tableState(refDir))
    // v1 init + 3 non-empty epochs = v4; a restart replay would read v5+
    assert(version(dir) == 4L)

    // idle restart: no new files, no version burned
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(version(dir) == 4L)
  }

  test("replayed epoch burns no version AND never executes the batch " +
      "plan (a poisoned replay frame does not throw)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink_replay").toString
    val dir = s"$base/tbl"
    initTable(dir)
    val sink = new GraftStreamingSink(dir, Map("txnAppId" -> "app1"),
      OutputMode.Append())
    sink.addBatch(0L, Seq((1L, 50L)).toDF("k", "v"))
    val v = version(dir)
    assert(tableState(dir)(1L) == 50L)
    // replay of epoch 0 with a frame that THROWS if any row is read:
    // the cursor fast-path must return before touching the plan
    val poisoned = Seq((1L, 666L)).toDF("k", "v")
      .select(col("k"), when(lit(true),
        raise_error(lit("replayed epoch executed its plan"))
          .cast("long")).otherwise(col("v")).as("v"))
    sink.addBatch(0L, poisoned)
    assert(version(dir) == v)
    assert(tableState(dir)(1L) == 50L)
    // the NEXT epoch applies normally
    sink.addBatch(1L, Seq((1L, 51L)).toDF("k", "v"))
    assert(tableState(dir)(1L) == 51L)
  }

  test("opCol/lsnCol: deletes apply and intra-epoch duplicates resolve " +
      "by lsn (the CDC-apply face of the sink)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink_cdc").toString
    val dir = s"$base/tbl"
    initTable(dir)
    val sink = new GraftStreamingSink(dir,
      Map("txnAppId" -> "cdc", "opCol" -> "op", "lsnCol" -> "lsn"),
      OutputMode.Update())
    // one epoch: k=1 updated twice (lsn decides), k=2 deleted
    sink.addBatch(0L, Seq(
      ("u", 100L, 1L, 500L),
      ("u", 101L, 1L, 501L), // later lsn wins
      ("d", 102L, 2L, 0L)
    ).toDF("op", "lsn", "k", "v"))
    val st = tableState(dir)
    assert(st(1L) == 501L)
    assert(!st.contains(2L))
    assert(st(3L) == 30L) // untouched
  }

  test("plain mode (no lsnCol): an intra-epoch duplicate key errors — " +
      "the nondeterministic-winner guard batch INSERT draws") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink_dup").toString
    val dir = s"$base/tbl"
    initTable(dir)
    val sink = new GraftStreamingSink(dir, Map("txnAppId" -> "dup"),
      OutputMode.Append())
    val e = intercept[Exception] {
      sink.addBatch(0L, Seq((1L, 5L), (1L, 6L)).toDF("k", "v"))
    }
    assert(e.getMessage != null)
    // the failed epoch burned no version; a clean epoch still lands
    assert(version(dir) == 1L)
  }

  test("Complete mode: each epoch atomically REPLACES the table (a " +
      "streaming aggregation end-to-end), replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sink_complete").toString
    val dir = s"$base/tbl"
    // table holds the aggregate: key=word, value=cnt
    PartitionedUpsert.init(Seq(("seed", 0L)).toDF("word", "cnt"),
      dir, "word", 4)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val agg = in.toDF().groupBy(col("value").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"))
    val q = agg.writeStream.format("graft")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$base/ckpt")
      .start(dir)
    in.addData("a", "b", "a")
    q.processAllAvailable()
    val st1 = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st1 == Map("a" -> 2L, "b" -> 1L)) // seed replaced away
    in.addData("b")
    q.processAllAvailable()
    q.stop()
    val st2 = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st2 == Map("a" -> 2L, "b" -> 2L))
  }

  test("foreachBatch-parity options (r17): sparse partial images " +
      "merge column-level; quarantine dead-letters the MERGED-image " +
      "violator; compactEvery bounds per-bucket files — all through " +
      "the shared CdcStream.mergeBatch body") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink_par").toString
    val dir = s"$base/tbl"
    PartitionedUpsert.init(
      Seq((1L, 5.0, 10.0), (2L, 2.0, 10.0)).toDF("pk", "v", "cap"),
      dir, "pk", 4)
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_cap", "v <= cap")
    val sink = new GraftStreamingSink(dir, Map(
      "txnAppId" -> "par", "opCol" -> "op", "lsnCol" -> "lsn",
      "sparse" -> "true", "quarantineDir" -> s"$base/dlq",
      "compactEvery" -> "1", "compactMaxFiles" -> "1"),
      org.apache.spark.sql.streaming.OutputMode.Update())
    // epoch 0: pk1 sets ONLY cap=3 (raw row passes the check — v is
    // NULL — but merged v=5 > 3 violates → the KEY dead-letters);
    // pk2 sets ONLY v=4 (merged 4<=10, applies; cap survives)
    sink.addBatch(0L, Seq(
      ("u", 1L, 1L, Option.empty[Double], false, Option(3.0), true),
      ("u", 2L, 2L, Option(4.0), true, Option.empty[Double], false)
    ).toDF("op", "lsn", "pk", "v", "v_present", "cap", "cap_present"))
    val st = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(st(1L) == ((5.0, 10.0)), "violating key keeps committed state")
    assert(st(2L) == ((4.0, 10.0)), "clean sparse update applies, cap kept")
    val dlq = spark.read.parquet(s"$base/dlq")
      .select("pk", "__violation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dlq == Seq((1L, "v_cap")))
    // compactEvery=1 ran after the epoch: every bucket within budget
    PartitionedUpsert.stats(spark, dir).foreach { case (b, files, _) =>
      assert(files <= 1, s"bucket $b not compacted: $files files")
    }
  }

  test("END-TO-END TABLE REPLICATION in one streaming query (the two " +
      "r17 faces composed): CDF snapshot+tail readStream into the " +
      "format-sink writeStream — replica converges to the source " +
      "through updates/inserts/deletes and across a restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_repl").toString
    val src = s"$base/src"; val dst = s"$base/dst"; val ckpt = s"$base/ckpt"
    initTable(src) // v1: keys 1..8
    // replica starts EMPTY — the stream's initial snapshot seeds it
    PartitionedUpsert.init(Seq.empty[(Long, Long)].toDF("k", "v"),
      dst, "k", 4)
    def start() = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "snapshot")
      .load(src)
      .select(col("k"), col("v"),
        when(col("change_type") === "delete", "d").otherwise("u").as("op"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("opCol", "op")
      .start(dst)
    val q1 = start()
    q1.processAllAvailable()
    assert(tableState(dst) == tableState(src), "snapshot seeds the replica")
    // live tail: update + insert + delete
    PartitionedUpsert.merge(spark, src,
      Seq((100L, 1L, "u", 111L), (100L, 9L, "u", 90L))
        .toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4): Unit
    PartitionedUpsert.merge(spark, src,
      Seq((101L, 2L, "d", 0L)).toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4): Unit
    q1.processAllAvailable()
    assert(tableState(dst) == tableState(src), "tail keeps the replica live")
    q1.stop()
    // changes while the replication is DOWN; restart resumes the seam
    PartitionedUpsert.merge(spark, src,
      Seq((102L, 3L, "u", 333L), (102L, 9L, "d", 0L))
        .toDF("lsn", "k", "op", "v"),
      "k", "lsn", "op", Seq("v"), 4): Unit
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(tableState(dst) == tableState(src),
      "restart converges without re-seeding or losing the gap")
    assert(!tableState(dst).contains(2L) && !tableState(dst).contains(9L))
  }

  test("guard rails: schema mismatch errors per epoch; start() fails on " +
      "an uninitialized target; partitionBy rejected") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink_guard").toString
    val dir = s"$base/tbl"
    initTable(dir)
    val sink = new GraftStreamingSink(dir, Map("txnAppId" -> "g"),
      OutputMode.Append())
    val e1 = intercept[IllegalArgumentException] {
      sink.addBatch(0L, Seq((1L, 2L)).toDF("k", "wrong"))
    }
    assert(e1.getMessage.contains("does not match"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/empty_in")): Unit
    val e2 = intercept[Exception] {
      spark.readStream.schema(jsonSchema).json(s"$base/empty_in")
        .writeStream.format("graft")
        .option("checkpointLocation", s"$base/ckpt2")
        .start(s"$base/not_a_table")
    }
    assert(e2.getMessage.contains("not an initialized upsert target"))
    // DECLARED metadata columns must be present (ADVICE r17): a
    // sparse stream missing a <col>_present flag — or the named
    // opCol/lsnCol — gets the gate's message, not an
    // unresolved-column death inside Cdc.applySparse
    val sparseSink = new GraftStreamingSink(dir,
      Map("txnAppId" -> "g2", "opCol" -> "op", "lsnCol" -> "lsn",
        "sparse" -> "true"), OutputMode.Append())
    val e3 = intercept[IllegalArgumentException] {
      // has op/lsn but NOT the required v_present flag
      sparseSink.addBatch(0L,
        Seq((1L, 2L, "u", 1L)).toDF("k", "v", "op", "lsn"))
    }
    assert(e3.getMessage.contains("missing declared metadata column"),
      e3.getMessage)
    assert(e3.getMessage.contains("v_present"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      // names an opCol the stream does not carry
      new GraftStreamingSink(dir, Map("txnAppId" -> "g3",
        "opCol" -> "op"), OutputMode.Append())
        .addBatch(0L, Seq((1L, 2L)).toDF("k", "v"))
    }
    assert(e4.getMessage.contains("missing declared metadata column"),
      e4.getMessage)
  }

  test("streaming write BY CATALOG NAME (r18): writeStream" +
      ".format(\"graft\").toTable resolves through the V1 fallback " +
      "onto the SAME path sink — kill-and-resume exactly-once state " +
      "equals the path-addressed sink's") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sink_name").toString
    val wh = s"$base/wh"; val in = s"$base/in"
    spark.conf.set("spark.sql.catalog.gsink",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink.warehouse", wh)
    spark.sql("CREATE NAMESPACE gsink.ns")
    spark.sql("CREATE TABLE gsink.ns.t (k BIGINT, v BIGINT) " +
      "USING graft PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gsink.ns.t VALUES " +
      (1L to 8L).map(k => s"($k, ${k * 10})").mkString(", "))
    val namedDir = s"$wh/ns/t"
    val refDir = s"$base/ref"
    initTable(refDir) // identical seed, path-addressed reference

    def startByName() = spark.readStream.schema(jsonSchema)
      .option("maxFilesPerTrigger", "1").json(in)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt_name")
      .toTable("gsink.ns.t")
    def startByPath() = spark.readStream.schema(jsonSchema)
      .option("maxFilesPerTrigger", "1").json(in)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt_path")
      .start(refDir)

    writeJsonl(s"$in/f1.jsonl", Seq((1L, 111L), (9L, 90L)))
    val q1 = startByName()
    q1.processAllAvailable()
    q1.stop() // kill
    writeJsonl(s"$in/f2.jsonl", Seq((2L, 222L), (1L, 112L)))
    val q2 = startByName() // resume from the same checkpoint
    q2.processAllAvailable()
    q2.stop()
    val vAfter = version(namedDir)
    // restart with nothing new: replayed/empty epochs burn no version
    val q3 = startByName()
    q3.processAllAvailable()
    q3.stop()
    assert(version(namedDir) == vAfter,
      "resume with no new data must not burn a table version")
    // the path-addressed reference over the same input files
    val qp = startByPath()
    qp.processAllAvailable()
    qp.stop()
    assert(tableState(namedDir) == tableState(refDir),
      "by-name and by-path sinks are ONE code path — states must match")
    assert(tableState(namedDir)(1L) == 112L &&
      tableState(namedDir)(2L) == 222L && tableState(namedDir)(9L) == 90L)
    // the provider check is Spark's own: a writer whose format is not
    // 'graft' is refused at toTable (the V1-fallback contract)
    val e = intercept[Exception] {
      spark.readStream.schema(jsonSchema).json(in)
        .writeStream // no .format("graft") — defaults to parquet
        .option("checkpointLocation", s"$base/ckpt_bad")
        .toTable("gsink.ns.t")
    }
    assert(Option(e.getMessage).exists(m =>
      m.toLowerCase.contains("graft")), e.getMessage)
  }
}
