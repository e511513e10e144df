package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.Cdc

/** Avro CDC envelope codec: exact encode→decode round-trip over a
  * corpus-derived change log, cross-format parity with the JSON
  * envelope path (one change model, two wire formats), and the
  * downstream apply working off the Avro-decoded log unchanged. */
class AvroCdcSpec extends SparkSpec {

  private val payload = StructType(Seq(
    StructField("pk", LongType),
    StructField("v", DoubleType),
    StructField("lbl", StringType)))

  /** Canonical envelope frame derived from the events table: inserts
    * carry no before-image, deletes no after-image, updates both —
    * every null path of the union schema exercised. */
  private def canonical = {
    import spark.implicits._
    graft.Tables.table(spark, sfSmoke, "events")
      .filter($"event_id" < 500)
      .select(
        when($"event_type" === "signup", "c")
          .when($"event_type" === "error", "d").otherwise("u").as("op"),
        when($"event_type" =!= "signup",
          struct($"user_id".as("pk"), ($"value" - 1.0).as("v"),
            lit("old").as("lbl"))).as("before"),
        when($"event_type" =!= "error",
          struct($"user_id".as("pk"), $"value".as("v"),
            concat(lit("e"), $"event_id").as("lbl"))).as("after"),
        lit("events").as("src_table"),
        $"event_id".as("lsn"),
        ($"event_id" * 1000L + 1700000000000L).as("ts_ms"))
  }

  test("encode→decode is an exact round-trip (nulls, doubles, strings)") {
    val src = canonical
    val wire = AvroCdc.encode(src, payload)
    // genuinely binary, one record per row
    assert(wire.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("value", BinaryType)))
    assert(wire.count() === src.count())
    val back = AvroCdc.decode(wire, "value", payload)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // both null paths actually present in the fixture
    assert(back.filter(col("before").isNull).count() > 0)
    assert(back.filter(col("after").isNull).count() > 0)
  }

  test("every supported payload type round-trips: long/int/double/" +
      "float/boolean/string/binary and a nested struct, null and " +
      "non-null per field") {
    import spark.implicits._
    val payload = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("nested", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    // 64 rows; each field independently null on its own modulus so
    // every (field, nullness) combination occurs
    val src = spark.range(64).select(
      lit("u").as("op"),
      when($"id" % 2 === 0, struct(
        when($"id" % 3 === 0, $"id").as("l"),
        when($"id" % 5 === 0, $"id".cast("int")).as("i"),
        when($"id" % 7 === 0, $"id" * 1.5).as("d"),
        when($"id" % 11 === 0, $"id".cast("float")).as("f"),
        when($"id" % 13 === 0, $"id" % 2 === 1).as("b"),
        when($"id" % 17 === 0, concat(lit("s"), $"id")).as("s"),
        when($"id" % 19 === 0, unhex(lpad(hex($"id"), 6, "0"))).as("bin"),
        when($"id" % 23 === 0,
          struct($"id".as("x"), lit("n").as("y"))).as("nested")))
        .as("before"),
      struct($"id".as("l"), $"id".cast("int").as("i"),
        ($"id" / 3.0).as("d"), ($"id" * 2).cast("float").as("f"),
        ($"id" % 2 === 0).as("b"), md5($"id".cast("string")).as("s"),
        unhex(md5($"id".cast("string"))).as("bin"),
        struct(($"id" * 7).as("x"), concat(lit("y"), $"id").as("y"))
          .as("nested")).as("after"),
      lit("t").as("src_table"), $"id".as("lsn"), ($"id" * 10).as("ts_ms"))
    val back = AvroCdc.decode(AvroCdc.encode(src, payload), "value", payload)
    assert(back.count() === 64)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("cross-format parity: Avro decode == JSON decode of the same " +
      "logical records, and Cdc.apply works off the Avro log unchanged") {
    import spark.implicits._
    val src = canonical
    // JSON wire form of the SAME records (the Cdc.decode path)
    val json = src.select(to_json(struct(col("op"), col("before"),
      col("after"),
      struct(col("src_table").as("table"), col("lsn")).as("source"),
      col("ts_ms"))).as("j"))
    val viaJson = Cdc.decode(json, "j", payload)
    val viaAvro = AvroCdc.decode(AvroCdc.encode(src, payload), "value", payload)
    assert(viaAvro.exceptAll(viaJson).isEmpty &&
      viaJson.exceptAll(viaAvro).isEmpty)
    // the decoded log drives the ordinary apply — wire format agnostic
    val log = viaAvro.select($"lsn", $"op",
      coalesce($"after.pk", $"before.pk").as("pk"), $"after.v".as("val"))
    val snap = Seq((0L, -1.0)).toDF("pk", "val")
    val state = Cdc.apply(snap, log, Seq("pk"), "lsn", "op", Seq("val"))
    // end-state per pk = last op wins; spot: any pk whose last op is 'd'
    // is absent, any 'c'/'u' tail carries its value
    val last = log.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy($"pk")
        .orderBy($"lsn".desc))).filter($"rn" === 1)
    val expectedLive = last.filter($"op" =!= "d").count() +
      (if (last.filter($"pk" === 0L).isEmpty) 1 else 0)
    assert(state.count() === expectedLive)
  }

  test(".avro container files: distributed write -> read is an exact " +
      "round-trip, one self-describing file per non-empty partition") {
    val dir = java.nio.file.Files.createTempDirectory("avro_files_rt")
      .toString
    val src = canonical.repartition(3)
    AvroCdc.writeFiles(src, payload, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 3, files.map(_.getName).mkString(","))
    // header magic: Avro OCF files start with 'Obj' 0x01
    val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(head === Array[Byte]('O', 'b', 'j', 1))
    val back = AvroCdc.readFiles(spark, dir, payload)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test(".avro container files: rewriting a directory with FEWER " +
      "partitions removes stale part files (overwrite semantics) and " +
      "leaves no .tmp orphans") {
    val dir = java.nio.file.Files.createTempDirectory("avro_files_ow")
      .toString
    AvroCdc.writeFiles(canonical.repartition(6), payload, dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) === 6)
    val narrow = canonical.repartition(2)
    AvroCdc.writeFiles(narrow, payload, dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".avro")) === 2, names.mkString(","))
    assert(!names.exists(_.endsWith(".tmp")), names.mkString(","))
    // and the read sees ONLY the second write's rows
    val back = AvroCdc.readFiles(spark, dir, payload)
    assert(back.count() === narrow.count())
    assert(back.exceptAll(narrow).isEmpty && narrow.exceptAll(back).isEmpty)
    // no staging residue after a successful swap
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.startsWith(new java.io.File(dir).getName)
      && n.contains("__staging")), parent.mkString(","))
  }

  test(".avro container files: a FAILED overwrite job leaves the old " +
      "data fully intact (r14 ADVICE: job-level staging swap, not " +
      "delete-then-write)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_files_fa")
      .toString
    AvroCdc.writeFiles(canonical.repartition(3), payload, dir)
    val before = AvroCdc.readFiles(spark, dir, payload)
      .collect().map(_.toString).sorted
    // a source whose evaluation THROWS in the executor mid-job: the
    // after.v payload raises on a subset of rows
    val poisoned = canonical.withColumn("after",
      when($"after".isNotNull, struct(
        $"after.pk".as("pk"),
        when($"after.pk" % 7 === 0,
          raise_error(lit("boom")).cast("double"))
          .otherwise($"after.v").as("v"),
        $"after.lbl".as("lbl"))))
    intercept[Exception] {
      AvroCdc.writeFiles(poisoned.repartition(3), payload, dir)
    }
    // old target byte-identical; the partial staging was cleaned up
    val after = AvroCdc.readFiles(spark, dir, payload)
      .collect().map(_.toString).sorted
    assert(after === before, "failed overwrite must not touch old data")
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.startsWith(new java.io.File(dir).getName)
      && n.contains("__staging")),
      s"failed job must clean its staging dir: ${parent.mkString(",")}")
  }

  test(".avro container files: deflate and snappy codecs round-trip " +
      "and are recorded in the header for reader auto-detect") {
    Seq("deflate", "snappy").foreach { codec =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"avro_files_$codec").toString
      val src = canonical.coalesce(1)
      AvroCdc.writeFiles(src, payload, dir, codec)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val headBytes = java.nio.file.Files.readAllBytes(f.toPath).take(4096)
      assert(new String(headBytes, "ISO-8859-1").contains(codec),
        s"header does not record avro.codec=$codec")
      val back = AvroCdc.readFiles(spark, dir, payload)
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    }
  }

  test(".avro container files: a FOREIGN file (plain avro-core writer," +
      " permuted field order, extra writer-only field) reads via " +
      "schema resolution") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("avro_files_foreign")
      .toString
    // writer schema: same record names as the canonical envelope (the
    // registry-compatibility precondition) but fields REVERSED plus an
    // extra writer-only txid — the reader must resolve by name and
    // skip the unknown field, not assume positional layout
    val canonical = new Schema.Parser()
      .parse(AvroCdc.avroSchemaJson(payload))
    val env = Schema.createRecord(canonical.getName, null,
      canonical.getNamespace, false)
    val reversed = canonical.getFields.asScala.toList.reverse.map(f =>
      new Schema.Field(f.name, f.schema, null,
        Schema.Field.NULL_DEFAULT_VALUE))
    val txid = new Schema.Field("txid",
      Schema.createUnion(List(Schema.create(Schema.Type.NULL),
        Schema.create(Schema.Type.LONG)).asJava), null,
      Schema.Field.NULL_DEFAULT_VALUE)
    env.setFields((txid :: reversed).asJava)
    def nonNull(f: Schema.Field) = f.schema.getTypes.get(1)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](env))
    w.create(env, new java.io.File(dir, "debezium-00001.avro"))
    (1L to 5L).foreach { i =>
      val rec = new GenericData.Record(env)
      rec.put("txid", i * 7L)
      rec.put("ts_ms", i * 100L)
      rec.put("op", if (i % 2 == 0) "u" else "c")
      val s = new GenericData.Record(nonNull(env.getField("source")))
      s.put("table", "events"); s.put("lsn", i)
      rec.put("source", s)
      val a = new GenericData.Record(nonNull(env.getField("after")))
      a.put("pk", i); a.put("v", i * 1.5); a.put("lbl", s"r$i")
      rec.put("after", a)
      w.append(rec)
    }
    w.close()
    val back = AvroCdc.readFiles(spark, dir, payload).orderBy(col("lsn"))
    val rows = back.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Any]("before") == null))
    assert(rows.map(_.getAs[Long]("lsn")).toSeq === (1L to 5L))
    assert(rows.head.getAs[org.apache.spark.sql.Row]("after")
      .getAs[Double]("v") === 1.5)
    assert(rows.head.getAs[String]("op") === "c")
    assert(rows.head.getAs[Long]("ts_ms") === 100L)
    assert(rows.head.getAs[String]("src_table") === "events")
  }
}
