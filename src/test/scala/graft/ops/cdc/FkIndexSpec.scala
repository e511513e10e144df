package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fk → [pk] companion index: join maintenance with the index must
  * equal the scan path (and a full re-join) through every window kind,
  * overflowed hub fks must stay correct via the restricted-scan
  * fallback, and the index itself must track fk transitions — and
  * ONLY transitions — from the fact CDF. */
class FkIndexSpec extends SparkSpec {

  private val FactCols = Seq("cents", "fk")
  private val DimCols = Seq("dname")

  private def freshDirs(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_fki").toString
    (s"$base/fact", s"$base/dim", s"$base/join")
  }

  private def direct(factDir: String, dimDir: String) =
    JoinMaintain.fullJoin(
      PartitionedUpsert.read(spark, factDir),
      PartitionedUpsert.read(spark, dimDir),
      "pk", "fk", "dk", FactCols, DimCols)

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("pk"),
      Option(r.getAs[java.lang.Long]("cents")).map(_.longValue),
      Option(r.getAs[java.lang.Long]("fk")).map(_.longValue),
      r.getAs[Boolean](JoinMaintain.markerCol("fk")),
      Option(r.getAs[String]("dname"))))
    .sortBy(_._1).toSeq

  private def jLong(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private val nullLong = null.asInstanceOf[java.lang.Long]

  test("index-backed maintenance equals a full re-join through fact " +
      "retargets/deletes and dim resurrection/orphaning — hub fks " +
      "overflow at maxRefs=2 and stay correct via the scan fallback") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    // fk=10 referenced by three pks → overflows a maxRefs=2 index
    val fact = Seq(
      (1L, jLong(100L), jLong(10L)), (2L, jLong(200L), jLong(10L)),
      (3L, jLong(300L), jLong(10L)), (4L, jLong(400L), jLong(20L)),
      (5L, nullLong, jLong(99L))
    ).toDF("pk", "cents", "fk")
    val dim = Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname")
    PartitionedUpsert.init(fact, factDir, "pk", 4)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    JoinMaintain.initJoin(spark, factDir, dimDir, joinDir, "fk", 4,
      fkIndex = true, maxRefs = 2)
    val idxDir = JoinMaintain.fkIndexDir(joinDir)
    val idx0 = PartitionedUpsert.read(spark, idxDir).collect()
      .map(r => r.getAs[Long]("fk") ->
        (r.getAs[Seq[Long]]("pks"), r.getAs[Boolean]("overflowed"))).toMap
    assert(idx0(10L)._2, "fk=10 (3 refs > maxRefs=2) must be overflowed")
    assert(!idx0(20L)._2 && idx0(20L)._1 === Seq(4L))
    assert(idx0(99L)._1 === Seq(5L), "dangling fks are indexed too")

    def assertCurrent(): Unit =
      assert(rows(JoinMaintain.readJoin(spark, joinDir)) ===
        rows(direct(factDir, dimDir)),
        "index-backed maintenance must equal a full re-join")

    // dim window touching BOTH an overflowed fk (rename 'ten') and an
    // indexed one (delete dk=20), plus a resurrection (insert dk=99)
    PartitionedUpsert.merge(spark, dimDir,
      Seq((100L, 10L, "u", "TEN"), (101L, 20L, "d", null.asInstanceOf[String]),
        (102L, 99L, "c", "ninetynine"))
        .toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assertCurrent()
    val byPk = rows(JoinMaintain.readJoin(spark, joinDir))
      .map(r => r._1 -> r).toMap
    assert(byPk(1L)._5 === Some("TEN"),
      "the overflowed fk's rows must re-derive via the scan fallback")
    assert(!byPk(4L)._4, "the indexed fk's rows must orphan via point reads")
    assert(byPk(5L)._5 === Some("ninetynine"),
      "resurrection must work through the index path")

    // fact window: retarget pk4 20→10 (hub), delete pk2, insert pk6
    PartitionedUpsert.merge(spark, factDir,
      Seq((200L, 4L, "u", jLong(410L), jLong(10L)),
        (201L, 2L, "d", nullLong, nullLong),
        (202L, 6L, "c", jLong(600L), jLong(20L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assertCurrent()
    // ... and a dim window AFTER the fact churn still lands right
    PartitionedUpsert.merge(spark, dimDir,
      Seq((300L, 20L, "c", "twenty-again")).toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assertCurrent()
    assert(rows(JoinMaintain.readJoin(spark, joinDir))
      .find(_._1 == 6L).exists(_._5 === Some("twenty-again")),
      "the re-inserted dim key must re-match the new fact row")
  }

  test("the index tracks fk TRANSITIONS only: value updates are a " +
      "metadata no-op window, retargets move the pk between rows, an " +
      "emptied row is deleted, and a lagging index heals in one step") {
    import spark.implicits._
    val (factDir, _, _) = freshDirs()
    val idxDir = s"$factDir.idx"
    PartitionedUpsert.init(
      Seq((1L, jLong(1L), jLong(10L)), (2L, jLong(2L), jLong(20L)))
        .toDF("pk", "cents", "fk"),
      factDir, "pk", 4)
    FkIndex.init(spark, factDir, idxDir, "fk", 2)
    def idxRows() = PartitionedUpsert.read(spark, idxDir).collect()
      .map(r => r.getAs[Long]("fk") -> r.getAs[Seq[Long]]("pks")).toMap
    assert(idxRows() === Map(10L -> Seq(1L), 20L -> Seq(2L)))

    // value-only update: no fk transition → cursor advances, no data
    PartitionedUpsert.merge(spark, factDir,
      Seq((10L, 1L, "u", jLong(11L), jLong(10L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    val (f1, t1) = FkIndex.maintain(spark, factDir, idxDir)
    assert(f1 < t1)
    assert(idxRows() === Map(10L -> Seq(1L), 20L -> Seq(2L)))
    // replay: already-current fast path
    val (f2, t2) = FkIndex.maintain(spark, factDir, idxDir)
    assert(f2 === t2)

    // TWO windows before one maintain (lag heals): retarget 1: 10→20,
    // then delete 2 — fk=10's row empties and must be deleted
    PartitionedUpsert.merge(spark, factDir,
      Seq((20L, 1L, "u", jLong(11L), jLong(20L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    PartitionedUpsert.merge(spark, factDir,
      Seq((30L, 2L, "d", nullLong, nullLong))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    val (f3, t3) = FkIndex.maintain(spark, factDir, idxDir)
    assert(t3 - f3 === 2L, "one step must span both fact windows")
    assert(idxRows() === Map(20L -> Seq(1L)),
      "retarget must move the pk; the emptied fk row must be deleted")
    // foreign target rejected
    intercept[IllegalStateException] {
      FkIndex.maintain(spark, factDir, s"$factDir.other")
    }
  }

  test("maintenance caps with the INIT-time recorded maxRefs — a " +
      "caller cannot silently grow an unflagged hub through catch-up") {
    import spark.implicits._
    val (factDir, _, _) = freshDirs()
    val idxDir = s"$factDir.capidx"
    PartitionedUpsert.init(
      Seq((1L, jLong(1L), jLong(10L))).toDF("pk", "cents", "fk"),
      factDir, "pk", 2)
    FkIndex.init(spark, factDir, idxDir, "fk", 2, maxRefs = 1)
    // a second pk lands on fk=10 through MAINTENANCE (no maxRefs arg
    // anywhere — the cap must come from the index's own manifest)
    PartitionedUpsert.merge(spark, factDir,
      Seq((10L, 2L, "c", jLong(2L), jLong(10L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 2)
    FkIndex.maintain(spark, factDir, idxDir)
    val r = PartitionedUpsert.read(spark, idxDir)
      .filter(col("fk") === 10L).collect().head
    assert(r.getAs[Boolean]("overflowed"),
      "2 members past the recorded cap of 1 must flag overflow")
    assert(r.getAs[Seq[Long]]("pks").length === 1)
  }

  test("lookup is bounded: a 1-fk lookup reads <= 1 index bucket and " +
      "its pk point-read touches <= |pks| join buckets") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    val fact = (0L until 64L).map(i => (i, jLong(i), jLong(i % 8)))
      .toDF("pk", "cents", "fk")
    val dim = (0L until 8L).map(i => (i, s"d$i")).toDF("dk", "dname")
    PartitionedUpsert.init(fact, factDir, "pk", 8)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    // 32 join buckets so the 8-pk point read's <=8-bucket bound is a
    // REAL prune, not the whole table
    JoinMaintain.initJoin(spark, factDir, dimDir, joinDir, "fk", 32,
      fkIndex = true)
    val idxDir = JoinMaintain.fkIndexDir(joinDir)
    val oneFk = Seq(3L).toDF("fk")
    val (pkKeys, hubFks) = FkIndex.lookup(spark, idxDir, oneFk)
    assert(hubFks.isEmpty)
    val idxDirs = PartitionedUpsert.readForKeys(spark, idxDir, oneFk, "fk")
      .inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(idxDirs.length <= 1,
      s"one fk must read <= 1 index bucket, got ${idxDirs.mkString(",")}")
    val pks = pkKeys.select(col("__pk").as("pk"))
    assert(pks.count() === 8L, "8 of 64 fact rows reference fk=3")
    // readForKeys returns the touched BUCKETS (a superset — deltaRows
    // re-filters); the bound under test is the bucket read, and the
    // key-filtered rows must be exactly the referencing ones
    val joinRead = PartitionedUpsert.readForKeys(spark, joinDir, pks, "pk")
    assert(joinRead.join(pks, Seq("pk"), "left_semi").count() === 8L)
    val joinDirs = joinRead.inputFiles
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(joinDirs.length <= 8,
      s"the point read must touch <= |pks| of 32 join buckets, got " +
        s"${joinDirs.length}")
  }
}
