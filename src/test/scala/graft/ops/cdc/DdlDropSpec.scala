package graft.ops.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DDL column-DROP replay — the schema-evolution direction rename +
  * widen left out: era-aware projection on pre-drop batches, atomic
  * target evolution, kill-and-resume streaming replay, and the
  * key-column guard. */
class DdlDropSpec extends SparkSpec {

  test("applySchemaChanges: pre-drop batches lose the column; replay is idempotent") {
    import spark.implicits._
    val pre = Seq((1L, 10, "keepme"), (2L, 20, "bye"))
      .toDF("pk", "val", "note")
    val dropped = Cdc.applySchemaChanges(pre, Seq(Cdc.DropColumn("note")))
    assert(dropped.columns.toSeq == Seq("pk", "val"))
    // a post-drop batch no longer carries the column — the same change
    // list must no-op, not fail (replayed crashed batch)
    val again = Cdc.applySchemaChanges(dropped, Seq(Cdc.DropColumn("note")))
    assert(again.columns.toSeq == Seq("pk", "val"))
    // era alignment: pre-drop and post-drop batches union cleanly
    val post = Seq((3L, 30)).toDF("pk", "val")
    val aligned = Cdc.alignSchemasWithDdl(Seq(
      (pre, Seq(Cdc.DropColumn("note"))), (post, Seq.empty)))
    assert(aligned.columns.toSeq == Seq("pk", "val") && aligned.count() == 3)
  }

  test("schemaChangesWithLsn parses the drop payload with its recorded type") {
    import spark.implicits._
    val log = Seq(
      (4L, "s", """{"drop":{"col":"note","type":"string"}}"""),
      (2L, "s", """{"rename":{"from":"a","to":"b"}}"""),
      (6L, "s", """{"drop":{"col":"legacy"}}""")).toDF("lsn", "op", "ddl")
    val changes = Cdc.schemaChangesWithLsn(log, "op", "ddl", "lsn")
    assert(changes == Seq(
      2L -> Cdc.RenameColumn("a", "b"),
      4L -> Cdc.DropColumn("note", Some(StringType)),
      6L -> Cdc.DropColumn("legacy", None)))
  }

  test("evolveSchema drops the column atomically; merges continue; time travel keeps the old era") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddldrop").toString
    PartitionedUpsert.init(
      Seq((1L, 10, "x"), (2L, 20, "y")).toDF("pk", "val", "note"),
      dir, "pk", 2)
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.DropColumn("note", Some(StringType))), "pk", 2)
    val evolved = PartitionedUpsert.read(spark, dir)
    assert(evolved.schema.fieldNames.toSeq == Seq("pk", "val"))
    // replayed DDL batch: identical schema → no rewrite, no version burn
    val v = PartitionedUpsert.manifestOrFail(spark, dir).version
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(Cdc.DropColumn("note", Some(StringType))), "pk", 2)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == v)
    // merges continue in the new schema
    PartitionedUpsert.merge(spark, dir,
      Seq((100L, 3L, "i", 30), (101L, 1L, "u", 11))
        .toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 2)
    val state = PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(state == Map(1L -> 11, 2L -> 20, 3L -> 30))
    // the pre-drop era is still readable via time travel
    val old = PartitionedUpsert.readVersion(spark, dir, 1L)
    assert(old.schema.fieldNames.contains("note"))
  }

  test("dropping the bucket key is rejected loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddldropkey").toString
    PartitionedUpsert.init(Seq((1L, 10)).toDF("pk", "val"), dir, "pk", 2)
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.evolveSchema(spark, dir,
        Seq(Cdc.DropColumn("pk", Some(LongType))), "pk", 2)
    }
    assert(e.getMessage.contains("bucket key"))
  }

  test("auto-DDL sink: drop mid-batch, era-parsed pre-drop events, kill-and-resume heals") {
    import graft.streaming.CdcStream
    val base = java.nio.file.Files.createTempDirectory("graft_addldrop").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/$name"), lines.mkString("\n")): Unit
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", IntegerType),
      StructField("note", StringType)))
    def start() = CdcStream.autoDdlUpsertSink(
      CdcStream.rawSource(spark, srcDir),
      s"$base/tgt", s"$base/ckpt", "pk", payload, nBuckets = 4)

    write("a.json", Seq(
      """{"op":"c","after":{"pk":1,"val":10,"note":"n1"},"source":{"table":"t","lsn":1},"ts_ms":1}""",
      """{"op":"c","after":{"pk":2,"val":20,"note":"n2"},"source":{"table":"t","lsn":2},"ts_ms":2}"""))
    val q1 = start()
    q1.processAllAvailable()
    // one micro-batch spanning the drop: a pre-drop update (whose JSON
    // still spells "note"), the drop DDL (type recorded), post-drop data
    write("b.json", Seq(
      """{"op":"u","after":{"pk":2,"val":25,"note":"n2b"},"source":{"table":"t","lsn":3},"ts_ms":3}""",
      """{"op":"s","ddl":{"drop":{"col":"note","type":"string"}},"source":{"table":"t","lsn":4},"ts_ms":4}""",
      """{"op":"c","after":{"pk":5,"val":50},"source":{"table":"t","lsn":5},"ts_ms":5}"""))
    q1.processAllAvailable()
    q1.stop() // kill

    // resume: lsn 5 REDELIVERED stale + fresh post-drop data — dedup
    // state and the already-evolved target must both hold
    write("c.json", Seq(
      """{"op":"c","after":{"pk":5,"val":5555},"source":{"table":"t","lsn":5},"ts_ms":5}""",
      """{"op":"u","after":{"pk":1,"val":11},"source":{"table":"t","lsn":6},"ts_ms":6}"""))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val out = PartitionedUpsert.read(spark, s"$base/tgt")
    assert(out.schema.fieldNames.toSeq == Seq("pk", "val"),
      s"note must be dropped, got ${out.schema.fieldNames.toSeq}")
    val state = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(state == Map(1L -> 11, 2L -> 25, 5L -> 50), s"got $state")
  }
}
