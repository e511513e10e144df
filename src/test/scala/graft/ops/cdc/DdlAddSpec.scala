package graft.ops.cdc

import org.apache.spark.sql.types._

import graft.SparkSpec

/** DDL column-ADD — the most common schema drift in CDC reality and
  * the METADATA-SPEED member of the evolution algebra: an all-adds
  * evolveSchema swaps the manifest over the SAME data files (parquet
  * missing-column reads null), never rewriting a byte. Covers the
  * event algebra, the payload parser, the metadata-only manifest
  * swap, the ALTER TABLE SQL face (single and multi-column), merge
  * continuation, and the streaming auto-DDL sink. */
class DdlAddSpec extends SparkSpec {

  test("applySchemaChanges: AddColumn appends a typed null column; " +
      "replay no-ops; a same-name different-type add fails loudly") {
    import spark.implicits._
    val pre = Seq((1L, 10), (2L, 20)).toDF("pk", "val")
    val added = Cdc.applySchemaChanges(pre,
      Seq(Cdc.AddColumn("bonus", LongType)))
    assert(added.columns.toSeq == Seq("pk", "val", "bonus"))
    assert(added.schema("bonus").dataType == LongType)
    assert(added.collect().forall(_.isNullAt(2)))
    // replayed add: column already there at the declared type → no-op
    val again = Cdc.applySchemaChanges(added,
      Seq(Cdc.AddColumn("bonus", LongType)))
    assert(again.columns.toSeq == Seq("pk", "val", "bonus"))
    // conflicting add: existing column at a different type is not a
    // replay, it is a collision — loud
    val e = intercept[IllegalArgumentException] {
      Cdc.applySchemaChanges(added, Seq(Cdc.AddColumn("val", StringType)))
    }
    assert(e.getMessage.contains("already"))
    // era alignment: pre-add and post-add batches union cleanly
    val post = Seq((3L, 30, 300L)).toDF("pk", "val", "bonus")
    val aligned = Cdc.alignSchemasWithDdl(Seq(
      (pre, Seq(Cdc.AddColumn("bonus", LongType))), (post, Seq.empty)))
    assert(aligned.columns.toSeq == Seq("pk", "val", "bonus")
      && aligned.count() == 3)
  }

  test("schemaChangesWithLsn parses the add payload; a typeless add " +
      "fails loudly (a column without a type cannot be planned)") {
    import spark.implicits._
    val log = Seq(
      (3L, "s", """{"add":{"col":"bonus","type":"bigint"}}"""),
      (1L, "s", """{"rename":{"from":"a","to":"b"}}""")).toDF("lsn", "op", "ddl")
    assert(Cdc.schemaChangesWithLsn(log, "op", "ddl", "lsn") == Seq(
      1L -> Cdc.RenameColumn("a", "b"),
      3L -> Cdc.AddColumn("bonus", LongType)))
    val bad = Seq((5L, "s", """{"add":{"col":"bonus"}}""")).toDF("lsn", "op", "ddl")
    val e = intercept[IllegalArgumentException] {
      Cdc.schemaChangesWithLsn(bad, "op", "ddl", "lsn")
    }
    assert(e.getMessage.contains("type"))
  }

  test("evolveSchema all-adds is METADATA-ONLY: same bucket files, one " +
      "manifest version, nulls on read; replay burns nothing; merges " +
      "carry the new column; time travel keeps the pre-add era") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddladd").toString
    PartitionedUpsert.init(
      Seq((1L, 10), (2L, 20)).toDF("pk", "val"), dir, "pk", 2)
    val pathsBefore = PartitionedUpsert.bucketPaths(spark, dir)
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("bonus", LongType)), "pk", 2)
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.version == 2L)
    // the metadata-only claim, asserted physically: identical file set
    assert(PartitionedUpsert.bucketPaths(spark, dir) == pathsBefore,
      "an all-adds evolve must not move a single data file")
    val evolved = PartitionedUpsert.read(spark, dir)
    assert(evolved.schema.fieldNames.toSeq == Seq("pk", "val", "bonus"))
    assert(evolved.collect().forall(_.isNullAt(2)),
      "pre-add rows must read the added column as null")
    // replayed DDL: identical schema → no version burn
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("bonus", LongType)), "pk", 2)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 2L)
    // merges continue, new column live
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 1L, "u", 11, 111L), (101L, 3L, "i", 30, 333L))
        .toDF("lsn", "pk", "op", "val", "bonus"),
      "pk", "lsn", "op", Seq("val", "bonus"), 2)
    val state = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(state == Map(1L -> ((11, 111L)), 2L -> ((20, -1L)),
      3L -> ((30, 333L))))
    // pre-add era still readable via time travel
    assert(!PartitionedUpsert.readVersion(spark, dir, 1L)
      .schema.fieldNames.contains("bonus"))
  }

  test("a MIXED batch (add + widen) takes the rewrite path and lands " +
      "both changes atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddlmix").toString
    PartitionedUpsert.init(Seq((1L, 10), (2L, 20)).toDF("pk", "val"),
      dir, "pk", 2)
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("bonus", LongType), Cdc.WidenColumn("val", LongType)),
      "pk", 2)
    val s = PartitionedUpsert.read(spark, dir).schema
    assert(s("val").dataType == LongType && s("bonus").dataType == LongType)
    assert(PartitionedUpsert.read(spark, dir).count() == 2)
  }

  test("spark.sql ALTER TABLE ADD COLUMN / ADD COLUMNS: metadata-only " +
      "evolution through the injected parser; catalog re-resolution " +
      "sees the new schema; inner type commas survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddladdsql").toString
    PartitionedUpsert.init(
      (1L to 20L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
    spark.sql("DROP TABLE IF EXISTS ddl_add_t")
    spark.sql(s"CREATE TABLE ddl_add_t USING graft LOCATION '$dir'")
    try {
      val pathsBefore = PartitionedUpsert.bucketPaths(spark, dir)
      spark.sql("ALTER TABLE ddl_add_t ADD COLUMN bonus BIGINT")
      assert(PartitionedUpsert.bucketPaths(spark, dir) == pathsBefore)
      assert(PartitionedUpsert.read(spark, dir).columns.toSeq
        == Seq("k", "v", "bonus"))
      // the SQL face sees the evolved schema and the null backfill
      val row = spark.sql(
        "SELECT k, v, bonus FROM ddl_add_t WHERE k = 3").head
      assert(row.getLong(1) == 30L && row.isNullAt(2))
      // multi-column ADD COLUMNS with a parenthesized type inside
      spark.sql(
        "ALTER TABLE ddl_add_t ADD COLUMNS (tag STRING, rate DECIMAL(10,2))")
      val s = PartitionedUpsert.read(spark, dir).schema
      assert(s.fieldNames.toSeq == Seq("k", "v", "bonus", "tag", "rate"))
      assert(s("rate").dataType == DecimalType(10, 2))
      // replayed statement: no version burn
      val ver = PartitionedUpsert.manifestOrFail(spark, dir).version
      spark.sql("ALTER TABLE ddl_add_t ADD COLUMN bonus BIGINT")
      assert(PartitionedUpsert.manifestOrFail(spark, dir).version == ver)
      // UPDATE backfills the added column through the same SQL face
      spark.sql("UPDATE ddl_add_t SET bonus = v * 2 WHERE k <= 2")
      val got = spark.sql(
        "SELECT bonus FROM ddl_add_t WHERE k <= 3 ORDER BY k").collect()
      assert(got(0).getLong(0) == 20L && got(1).getLong(0) == 40L
        && got(2).isNullAt(0))
    } finally spark.sql("DROP TABLE IF EXISTS ddl_add_t")
  }

  test("auto-DDL sink: add mid-batch — pre-add events era-parsed " +
      "without the column, post-add events carry it, kill-and-resume " +
      "heals") {
    import graft.streaming.CdcStream
    val base = java.nio.file.Files.createTempDirectory("graft_addlad").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/$name"), lines.mkString("\n")): Unit
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", IntegerType)))
    def start() = CdcStream.autoDdlUpsertSink(
      CdcStream.rawSource(spark, srcDir),
      s"$base/tgt", s"$base/ckpt", "pk", payload, nBuckets = 4)

    write("a.json", Seq(
      """{"op":"c","after":{"pk":1,"val":10},"source":{"table":"t","lsn":1},"ts_ms":1}""",
      """{"op":"c","after":{"pk":2,"val":20},"source":{"table":"t","lsn":2},"ts_ms":2}"""))
    val q1 = start()
    q1.processAllAvailable()
    // one micro-batch spanning the add: pre-add update (no "bonus" in
    // its JSON), the add DDL, post-add insert carrying the column
    write("b.json", Seq(
      """{"op":"u","after":{"pk":2,"val":25},"source":{"table":"t","lsn":3},"ts_ms":3}""",
      """{"op":"s","ddl":{"add":{"col":"bonus","type":"bigint"}},"source":{"table":"t","lsn":4},"ts_ms":4}""",
      """{"op":"c","after":{"pk":5,"val":50,"bonus":500},"source":{"table":"t","lsn":5},"ts_ms":5}"""))
    q1.processAllAvailable()
    q1.stop() // kill

    // resume: lsn 5 redelivered stale + fresh post-add data
    write("c.json", Seq(
      """{"op":"c","after":{"pk":5,"val":5555,"bonus":1},"source":{"table":"t","lsn":5},"ts_ms":5}""",
      """{"op":"u","after":{"pk":1,"val":11,"bonus":111},"source":{"table":"t","lsn":6},"ts_ms":6}"""))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val out = PartitionedUpsert.read(spark, s"$base/tgt")
    assert(out.schema.fieldNames.toSeq == Seq("pk", "val", "bonus"),
      s"bonus must be added, got ${out.schema.fieldNames.toSeq}")
    val state = out.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(state == Map(1L -> ((11, 111L)), 2L -> ((25, -1L)),
      5L -> ((50, 500L))), s"got $state")
  }

  test("ADD COLUMN ... DEFAULT (r18): metadata-only, pre-add rows read " +
      "the default, post-add writes keep their own values (explicit " +
      "NULL included), a rewrite materializes and deactivates, time " +
      "travel keeps the pre-add era, CDF honest across the seam") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ddl_default").toString
    PartitionedUpsert.init(
      Seq((1L, 10), (2L, 20), (3L, 30)).toDF("pk", "val"), dir, "pk", 2)
    val pathsBefore = PartitionedUpsert.bucketPaths(spark, dir)
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("tier", LongType, Some("7"))), "pk", 2) // v2
    assert(PartitionedUpsert.bucketPaths(spark, dir) == pathsBefore,
      "ADD ... DEFAULT must stay metadata-only")
    val m2 = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m2.defaults.map(_.col) == Seq("tier"))
    // pre-add rows read the default — through the core read AND the
    // DSv2 format face (one semantics, two faces)
    def tiers(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select("pk", "tier").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tiers(PartitionedUpsert.read(spark, dir)) ==
      Map(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L)))
    assert(tiers(spark.read.format("graft").load(dir)) ==
      Map(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L)))
    // a FILTER on the defaulted column through the DSv2 face must see
    // the filled values (re-planted predicates evaluate AFTER the fill)
    assert(spark.read.format("graft").load(dir)
      .filter($"tier" === 7L).count() == 3L)
    // post-add write: explicit values AND an explicit NULL stick
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 1L, "u", 11, Some(9L)),
        (100L, 4L, "i", 40, None: Option[Long]))
        .toDF("lsn", "pk", "op", "val", "tier"),
      "pk", "lsn", "op", Seq("val", "tier"), 2) // v3
    val after = tiers(PartitionedUpsert.read(spark, dir))
    assert(after(1L) == Some(9L), "post-add explicit value sticks")
    assert(after(4L) == None, "post-add explicit NULL stays NULL")
    // the REWRITTEN buckets materialized the default for rows 2/3 if
    // they shared a bucket with the merge; either way every pre-add
    // survivor still reads 7
    assert(after(2L) == Some(7L) && after(3L) == Some(7L))
    // time travel: the pre-add era has no column; the add-era version
    // still serves the default
    assert(!PartitionedUpsert.readVersion(spark, dir, 1L)
      .schema.fieldNames.contains("tier"))
    assert(tiers(PartitionedUpsert.readVersion(spark, dir, 2L)) ==
      Map(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L)))
    // CDF honesty across the seam: a window SPANNING the add keeps
    // the one-schema-era refusal (the documented era-restart contract
    // — consumers drain the old era, restart from the add); the
    // POST-add window shows honest default-aware images
    val eraErr = intercept[IllegalArgumentException] {
      PartitionedUpsert.changesBetween(spark, dir, 1L, 2L)
    }
    assert(eraErr.getMessage.contains("schema era"))
    val mergeWindow = PartitionedUpsert.changesBetween(spark, dir, 2L, 3L)
      .select("pk", "change_type", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(mergeWindow == Set((1L, "update", Some(9L)),
      (4L, "insert", None)), s"got $mergeWindow")
    // replay no-op: the same ADD again burns nothing
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.AddColumn("tier", LongType, Some("7"))), "pk", 2)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 3L)
    // literal gate: column refs and non-deterministic defaults refuse
    intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.AddColumn("bad", LongType, Some("val + 1"))), "pk", 2)
    }
    intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.AddColumn("bad", LongType, Some("rand()"))), "pk", 2)
    }
  }
}
