package graft.ops.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  /** Deterministic random change log (fixed seed). */
  private def randomLog(seed: Long, n: Int, nKeys: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until n).map { i =>
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "c"; case 2 => "d"; case _ => "u"
      }
      (i.toLong, rnd.nextInt(nKeys).toLong, op,
        math.round(rnd.nextDouble() * 10000) / 100.0,
        new Timestamp(base + i * 1000L))
    }
    rows.toDF("lsn", "pk", "op", "val", "ts")
  }

  test("compact is idempotent and keeps exactly the max-lsn row per key") {
    import spark.implicits._
    val log = randomLog(42, 500, 23)
    val once = Cdc.compact(log, Seq("pk"), "lsn")
    val twice = Cdc.compact(once, Seq("pk"), "lsn")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    val expected = log.groupBy($"pk").agg(max($"lsn").as("lsn"))
    assert(once.select("pk", "lsn").exceptAll(expected).isEmpty)
    assert(once.count() === log.select("pk").distinct().count())
  }

  test("compactSalted equals compact (incl. a 50%-hot-key log)") {
    import spark.implicits._
    val base = randomLog(17, 600, 19)
    // slam half the rows onto one hot key — the skew shape salting exists for
    val hot = base.withColumn("pk",
      when($"lsn" % 2 === 0, lit(7L)).otherwise($"pk"))
    for (log <- Seq(base, hot)) {
      val plain = Cdc.compact(log, Seq("pk"), "lsn")
      val salted = Cdc.compactSalted(log, Seq("pk"), "lsn", nSalts = 8)
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    }
  }

  test("apply is associative: apply(s, l1++l2) == apply(apply(s, l1), l2)") {
    import spark.implicits._
    val snap = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (50L, 9.9))
      .toDF("pk", "val")
    val full = randomLog(7, 400, 30)
    val l1 = full.filter($"lsn" < 200)
    val l2 = full.filter($"lsn" >= 200)
    val oneShot = Cdc.apply(snap, full, Seq("pk"), "lsn", "op", Seq("val"))
      .drop("src")
    val staged = {
      val mid = Cdc.apply(snap, l1, Seq("pk"), "lsn", "op", Seq("val")).drop("src")
      Cdc.apply(mid, l2, Seq("pk"), "lsn", "op", Seq("val")).drop("src")
    }
    assert(oneShot.exceptAll(staged).isEmpty && staged.exceptAll(oneShot).isEmpty)
  }

  test("apply drops tombstoned keys and keeps untouched snapshot rows") {
    import spark.implicits._
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("pk", "val")
    val log = Seq(
      (100L, 1L, "u", 11.0), (101L, 2L, "d", 0.0), (102L, 4L, "c", 40.0))
      .map { case (l, p, o, v) => (l, p, o, v) }.toDF("lsn", "pk", "op", "val")
    val out = Cdc.apply(snap, log, Seq("pk"), "lsn", "op", Seq("val"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(out(1L) === ((11.0, "log")))       // updated
    assert(!out.contains(2L))                 // tombstoned
    assert(out(3L) === ((30.0, "snapshot")))  // untouched
    assert(out(4L) === ((40.0, "log")))       // inserted
  }

  test("scd2: per-key intervals chain without gaps; exactly one current") {
    import spark.implicits._
    val log = randomLog(99, 300, 17)
    val h = Cdc.scd2(log, Seq("pk"), "lsn", "ts")
    // one open interval per key
    val cur = h.filter($"is_current").groupBy($"pk").count()
    assert(cur.filter($"count" =!= 1).count() === 0)
    // each non-current row's valid_to equals the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"pk").orderBy($"lsn")
    val chained = h.withColumn("next_from", lead($"valid_from", 1).over(w))
    assert(chained.filter($"valid_to" =!= $"next_from").count() === 0)
  }

  test("checksum is order- and partitioning-insensitive") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(concat_ws("|", $"c_custkey", $"c_name").as("fp"))
    val a = Cdc.checksum(df, Seq("fp")).head()
    val b = Cdc.checksum(df.orderBy(rand(123)).repartition(7), Seq("fp")).head()
    assert(a === b)
  }

  test("diff classifies missing/extra/mismatch and drops equal rows") {
    import spark.implicits._
    val exp = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val act = Seq((1L, "a"), (3L, "CHANGED"), (4L, "extra")).toDF("pk", "v")
    val out = Cdc.diff(exp, act, Seq("pk"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "missing_in_replica", 3L -> "mismatch",
      4L -> "extra_in_replica"))
  }

  test("repairPlan closes the detect→repair loop: merging the plan " +
      "makes the replica equal the source, sized by the divergence, " +
      "idempotent, and LWW-safe against stragglers") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_rep").toString
    val expected = (1L to 50L).map(pk => (pk, s"v$pk", pk * 10))
      .toDF("pk", "name", "cents")
    // corrupted replica: 3 rows missing, 2 extra, 4 value-corrupted
    val corrupted = (1L to 50L).filterNot(Set(5L, 9L, 13L))
      .map(pk => (pk, s"v$pk", if (pk % 11 == 0) -1L else pk * 10)) ++
      Seq((100L, "ghost", 0L), (101L, "ghost2", 0L))
    PartitionedUpsert.init(corrupted.toDF("pk", "name", "cents"),
      s"$base/replica", "pk", nBuckets = 4)
    val actual = PartitionedUpsert.read(spark, s"$base/replica")
    val plan = Cdc.repairPlan(expected, actual, Seq("pk"),
      Seq("name", "cents"), lsnBase = 1000L)
    assert(plan.count() === 3 + 2 + 4, "plan sized by the divergence")
    PartitionedUpsert.merge(spark, s"$base/replica", plan,
      "pk", "lsn", "op", Seq("name", "cents"), nBuckets = 4)
    val repaired = PartitionedUpsert.read(spark, s"$base/replica")
    assert(Cdc.diff(expected, repaired, Seq("pk"),
      Seq("name", "cents")).isEmpty, "repair must converge to expected")
    // idempotent: the re-derived plan is empty
    assert(Cdc.repairPlan(expected, repaired, Seq("pk"),
      Seq("name", "cents"), lsnBase = 2000L).isEmpty)
  }

  test("envelope decode round-trips a generated Debezium-style JSONL file") {
    import spark.implicits._
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val lines = Seq(
      """{"op":"c","before":null,"after":{"id":1,"v":1.5},"source":{"table":"t","lsn":10},"ts_ms":1700000000000}""",
      """{"op":"u","before":{"id":1,"v":1.5},"after":{"id":1,"v":2.5},"source":{"table":"t","lsn":11},"ts_ms":1700000001000}""",
      """{"op":"d","before":{"id":1,"v":2.5},"after":null,"source":{"table":"t","lsn":12},"ts_ms":1700000002000}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/changes.jsonl"), lines.mkString("\n"))
    val raw = spark.read.text(s"$dir/changes.jsonl").withColumnRenamed("value", "j")
    val decoded = Cdc.decode(raw, "j", payload).orderBy($"lsn")
    val rows = decoded.collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("op")).toSeq === Seq("c", "u", "d"))
    assert(rows(1).getAs[org.apache.spark.sql.Row]("after").getDouble(1) === 2.5)
    assert(rows(2).getAs[org.apache.spark.sql.Row]("after") === null)
    // applying the decoded log end-state: id 1 was deleted
    val log = decoded.select($"lsn", $"op",
      coalesce($"after.id", $"before.id").as("pk"), $"after.v".as("val"))
    val snap = Seq((1L, 0.0), (2L, 5.0)).toDF("pk", "val")
    val state = Cdc.apply(snap, log, Seq("pk"), "lsn", "op", Seq("val"))
    assert(state.collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("decodeWithDlq partitions the input: every record lands in exactly " +
      "one side, quarantine keeps the raw record and a failure class") {
    import spark.implicits._
    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("v", DoubleType)))
    def env(op: String, pk: Long, lsn: String) =
      s"""{"op":"$op","after":{"pk":$pk,"v":1.5},"source":{"table":"t","lsn":$lsn},"ts_ms":1}"""
    val records = Seq(
      env("c", 1, "1"),                       // good
      env("u", 2, "2"),                       // good
      env("c", 3, "3").dropRight(1),          // malformed_json (truncated)
      "not json at all",                      // malformed_json
      env("x", 4, "4"),                       // invalid_op
      env("c", 5, "null"),                    // missing_lsn
      """{"after":{"pk":6,"v":2.0},"source":{"table":"t","lsn":6},"ts_ms":1}""") // missing_op
    val df = records.toDF("j")
    val (good, bad) = Cdc.decodeWithDlq(df, "j", payload)
    assert(good.count() + bad.count() === records.length,
      "good and quarantined must partition the input")
    assert(good.count() === 2)
    assert(good.select("after.pk").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val byClass = bad.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getString(0)).toSeq).toMap
    assert(byClass("malformed_json").length === 2)
    assert(byClass("invalid_op") === Seq(env("x", 4, "4")),
      "quarantine must keep the RAW record for replay-after-fix")
    assert(byClass("missing_lsn").length === 1)
    assert(byClass("missing_op").length === 1)
  }

  test("applyTransactional: in-flight transactions are withheld atomically") {
    import spark.implicits._
    val snap = Seq((1L, 10.0), (2L, 20.0)).toDF("pk", "val")
    // tx "a" committed (marker at lsn 4); tx "b" touches TWO keys but
    // its marker never arrived — neither of its events may apply
    val log = Seq(
      (1L, "a", 1L, "u", 11.0),
      (2L, "b", 1L, "u", 99.0),
      (3L, "b", 2L, "d", 0.0),
      (4L, "a", -1L, "t", 0.0))
      .toDF("lsn", "tx", "pk", "op", "val")
    val out = Cdc.applyTransactional(snap, log,
        Seq("pk"), "lsn", "op", Seq("val"), "tx")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 11.0, 2L -> 20.0), s"got $out")
    // once b's marker arrives, BOTH of its events become visible at once
    val complete = log.unionByName(
      Seq((5L, "b", -1L, "t", 0.0)).toDF("lsn", "tx", "pk", "op", "val"))
    val after = Cdc.applyTransactional(snap, complete,
        Seq("pk"), "lsn", "op", Seq("val"), "tx")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after === Map(1L -> 99.0), s"got $after")
    // NULL tx id = non-transactional event: applies directly, never dropped
    val mixed = log.unionByName(
      Seq((6L, null.asInstanceOf[String], 7L, "c", 70.0))
        .toDF("lsn", "tx", "pk", "op", "val"))
    val withPlain = Cdc.applyTransactional(snap, mixed,
        Seq("pk"), "lsn", "op", Seq("val"), "tx")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withPlain === Map(1L -> 11.0, 2L -> 20.0, 7L -> 70.0), s"got $withPlain")
  }

  test("DDL schema change: rename + type-widen normalize old batches forward") {
    import spark.implicits._
    // batch 1 captured under (id, val_old: int); then DDL renamed
    // val_old -> val and widened int -> bigint; batch 2 is post-DDL
    val b1 = Seq((1L, 10), (2L, 20)).toDF("id", "val_old")
    val b2 = Seq((3L, 3000000000L)).toDF("id", "val")
    val unified = Cdc.alignSchemasWithDdl(Seq(
      b1 -> Seq(Cdc.RenameColumn("val_old", "val"),
                Cdc.WidenColumn("val", LongType)),
      b2 -> Nil))
    assert(unified.columns.toSeq === Seq("id", "val"))
    assert(unified.schema("val").dataType === LongType)
    val out = unified.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 10L, 2L -> 20L, 3L -> 3000000000L))
  }

  test("DDL schema change: a lossy 'widen' is rejected loudly") {
    import spark.implicits._
    val b = Seq((1L, 3000000000L)).toDF("id", "val")
    val e = intercept[IllegalArgumentException] {
      Cdc.applySchemaChanges(b, Seq(Cdc.WidenColumn("val", IntegerType)))
    }
    assert(e.getMessage.contains("not a lossless widen"))
  }

  test("DDL schema change: op='s' events parse from the log in lsn order") {
    import spark.implicits._
    val log = Seq(
      (1L, "u", null.asInstanceOf[String]),
      (2L, "s", """{"rename":{"from":"a","to":"b"}}"""),
      (5L, "s", """{"widen":{"col":"b","to":"bigint"}}"""),
      (3L, "u", null.asInstanceOf[String]))
      .toDF("lsn", "op", "ddl")
    val changes = Cdc.schemaChangesFromLog(log, "op", "ddl", "lsn")
    assert(changes === Seq(
      Cdc.RenameColumn("a", "b"), Cdc.WidenColumn("b", LongType)))
    // and they replay end-to-end: old batch (a: int) -> (b: bigint)
    val old = Seq(7).toDF("a")
    val replayed = Cdc.applySchemaChanges(old, changes)
    assert(replayed.columns.toSeq === Seq("b"))
    assert(replayed.schema("b").dataType === LongType)
    assert(replayed.head().getLong(0) === 7L)
  }

  test("schema drift: Cdc.readWithDrift and Cdc.alignSchemas handle additive columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Seq((1L, "a")).toDF("id", "c1").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.9)).toDF("id", "c1", "c2_added").write.parquet(s"$dir/batch=2")
    val merged = Cdc.readWithDrift(spark, dir)
    assert(merged.columns.toSet === Set("id", "c1", "c2_added", "batch"))
    assert(merged.filter($"c2_added".isNull).count() === 1)
    val u = Cdc.alignSchemas(Seq(
      Seq((1L, "a")).toDF("id", "c1"),
      Seq((2L, "b", 9.9)).toDF("id", "c1", "c2_added")))
    // first-appearance column order: stable as the schema grows
    assert(u.columns.toSeq === Seq("id", "c1", "c2_added"))
    assert(u.filter($"c2_added".isNull).count() === 1)
    assert(u.count() === 2)
  }

  test("schemaChangesWithLsn: a DDL event with a NULL offset fails with a " +
      "classified error, not an NPE") {
    import spark.implicits._
    val log = Seq(
      ("s", """{"rename":{"from":"a","to":"b"}}""", Some(1L)),
      ("s", """{"widen":{"col":"b","to":"bigint"}}""", Option.empty[Long]))
      .toDF("op", "ddl", "lsn")
    val err = intercept[IllegalArgumentException] {
      Cdc.schemaChangesWithLsn(log, "op", "ddl", "lsn")
    }
    assert(err.getMessage.contains("NULL lsn"),
      s"unexpected message: ${err.getMessage}")
  }

  test("multi-master merge: LWW wins, priority breaks clock ties, lsn " +
      "breaks same-site ties; conflicts flagged exactly") {
    val rows = CdcQueries.qCdcMergeMulti(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Boolean]("conflict")),
      "fixture lost: no cross-site conflicts at all")
    // (at corpus density every key conflicts — the flag's false arm is
    // covered by the brute-force n_writes check below)
    // brute-force re-derivation of the winner rule per pk
    import spark.implicits._
    val log = CdcQueries.changeLog(spark, sfSmoke).collect().map { r =>
      val lsn = r.getAs[Long]("lsn")
      val site = if (lsn % 2 == 0) "a" else "b"
      val ts0 = r.getAs[Timestamp]("ts").getTime
      val ts = if (site == "a") ts0 else ts0 - ts0 % 60000 // b truncated to minute
      (r.getAs[Long]("pk"), ts, if (site == "a") 1 else 2, lsn, site)
    }
    val expect = log.groupBy(_._1).map { case (pk, ws) =>
      pk -> ws.maxBy(w => (w._2, w._3, w._4))
    }
    rows.foreach { r =>
      val pk = r.getAs[Long]("pk")
      val e = expect(pk)
      assert(r.getAs[String]("w_site") === e._5, s"pk=$pk wrong site")
      assert(r.getAs[Long]("w_lsn") === e._4, s"pk=$pk wrong lsn")
      assert(r.getAs[Long]("n_writes") === log.count(_._1 == pk).toLong)
    }
  }

  test("gap detect: exactly the planted lsn gaps fire, each 1 wide; " +
      "regressions only where commit time disagrees with lsn order") {
    val rows = CdcQueries.qCdcGapDetect(spark, sfSmoke).collect()
    assert(rows.nonEmpty, "planted gaps not detected")
    val maxLsn = CdcQueries.changeLog(spark, sfSmoke)
      .agg(max(col("lsn"))).head().getLong(0)
    val expectedGaps = (0L to maxLsn).filter(_ % 97 == 13)
    val gapRows = rows.filter(_.getAs[Long]("missing") > 0)
    // every gap row straddles exactly one withheld lsn
    gapRows.foreach { r =>
      assert(r.getAs[Long]("missing") === 1L,
        s"gap wider than the planted hole: $r")
      val missing = r.getAs[Long]("prev_lsn") + 1
      assert(missing % 97 === 13L, s"false gap at $missing")
    }
    assert(gapRows.length === expectedGaps.count(l => l > 0 && l < maxLsn),
      "gap count != planted interior holes")
  }

  test("mix schedule: budget splits exactly by weight, epochs consistent") {
    val rows = graft.ops.llm.CorpusStats.qLlmMixSchedule(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("weight_pct")).sum === 100L)
    assert(rows.map(_.getAs[Long]("budget_tokens")).sum === 1000000L)
    rows.foreach { r =>
      val e = r.getAs[Double]("epochs")
      val up = r.getAs[Boolean]("upsampled")
      assert(up === (e > 1.0), s"upsampled flag disagrees with epochs: $r")
      assert(e > 0)
    }
  }

  test("assortativity: star is perfectly disassortative, bounded in [-1,1] " +
      "on the corpus graph") {
    import spark.implicits._
    // a 5-leaf star: every edge joins degree-5 to degree-1 -> r = -1
    val li = Seq(
      // order o shares part 0 with parts 1..5 (one order per pair, twice
      // to clear the >=2 threshold)
      (101L, 0L), (101L, 1L), (102L, 0L), (102L, 1L),
      (103L, 0L), (103L, 2L), (104L, 0L), (104L, 2L),
      (105L, 0L), (105L, 3L), (106L, 0L), (106L, 3L),
      (107L, 0L), (107L, 4L), (108L, 0L), (108L, 4L),
      (109L, 0L), (109L, 5L), (110L, 0L), (110L, 5L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("assort").toString
    // reuse the corpus-shaped entry by writing a tiny lineitem parquet
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val star = graft.ops.relational.Graph.qGraphAssortativity(spark, dir).head()
    assert(star.getAs[Long]("n_nodes") === 6L)
    assert(star.getAs[Long]("n_edges") === 5L)
    assert(star.getAs[Double]("assortativity") === -1.0)
    val corpus = graft.ops.relational.Graph
      .qGraphAssortativity(spark, sfSmoke).head()
    val r = corpus.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0, s"r=$r out of range")
  }

  test("detrend: 24 hods per type, full-window counts consistent") {
    val rows = graft.ops.relational.Resample.qTsDetrend(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.length <= 24, s"$t has ${rs.length} hods")
      rs.foreach { r =>
        assert(r.getAs[Long]("n_windows") >= 1)
        val s = r.getAs[Double]("seasonal_cents")
        assert(!s.isNaN && !s.isInfinite)
      }
    }
  }
}
