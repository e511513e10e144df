package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental join maintenance from two CDFs: the maintained
  * fact-LEFT-OUTER-dim materialization must equal a full re-join after
  * every version window — through fact inserts/updates/deletes,
  * fk retargets, dim inserts that resurrect dangling fks, dim updates,
  * and dim deletes that orphan matched rows — while both source
  * cursors advance atomically in the join's own manifest. */
class JoinMaintainSpec extends SparkSpec {

  private val FactCols = Seq("cents", "fk")
  private val DimCols = Seq("dname")

  private def freshDirs(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_jm").toString
    (s"$base/fact", s"$base/dim", s"$base/join")
  }

  /** Full re-join of the current committed states — the equivalence
    * reference (the same function that seeds the materialization). */
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

  private def assertCurrent(factDir: String, dimDir: String,
                            joinDir: String): Unit =
    assert(rows(JoinMaintain.readJoin(spark, joinDir)) ===
      rows(direct(factDir, dimDir)),
      "maintained join must equal a full re-join")

  private def jLong(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private val nullLong = null.asInstanceOf[java.lang.Long]

  private def seed(factDir: String, dimDir: String, joinDir: String): Unit = {
    import spark.implicits._
    // pk 4: dangling fk (99 not in dim); pk 4 cents null
    val fact = Seq(
      (1L, jLong(100L), jLong(10L)),
      (2L, jLong(200L), jLong(10L)),
      (3L, jLong(300L), jLong(20L)),
      (4L, nullLong, jLong(99L))
    ).toDF("pk", "cents", "fk")
    val dim = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("dk", "dname")
    PartitionedUpsert.init(fact, factDir, "pk", 4)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    JoinMaintain.initJoin(spark, factDir, dimDir, joinDir, "fk", 4): Unit
  }

  test("multi-window equivalence: fact upsert/delete/fk-retarget, dim " +
      "insert resurrecting a dangling fk, dim update, dim delete " +
      "orphaning matched rows — and one step catches up two windows") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    seed(factDir, dimDir, joinDir)
    assertCurrent(factDir, dimDir, joinDir)
    assert(rows(JoinMaintain.readJoin(spark, joinDir))
      .find(_._1 == 4L).exists(r => !r._4 && r._5.isEmpty),
      "the dangling-fk row must be stored unmatched with null dim cols")

    // window 1 — fact only: insert (fk=30), retarget pk1 fk 10→20,
    // delete pk3
    PartitionedUpsert.merge(spark, factDir,
      Seq((100L, 5L, "c", jLong(500L), jLong(30L)),
        (101L, 1L, "u", jLong(110L), jLong(20L)),
        (102L, 3L, "d", nullLong, nullLong))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    val ((fF1, tF1), (fD1, tD1)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(fF1 < tF1 && fD1 === tD1,
      "a fact-only window must advance only the fact cursor")
    assertCurrent(factDir, dimDir, joinDir)

    // window 2 — dim only: insert dk=99 (resurrects pk4), rename
    // dk=10, delete dk=30 (orphans pk5)
    PartitionedUpsert.merge(spark, dimDir,
      Seq((200L, 99L, "c", "ninetynine"),
        (201L, 10L, "u", "TEN"),
        (202L, 30L, "d", null.asInstanceOf[String]))
        .toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assertCurrent(factDir, dimDir, joinDir)
    val byPk = rows(JoinMaintain.readJoin(spark, joinDir))
      .map(r => r._1 -> r).toMap
    assert(byPk(4L)._4 && byPk(4L)._5 === Some("ninetynine"),
      "a dim insert must resurrect the previously-unmatched fact row")
    assert(!byPk(5L)._4 && byPk(5L)._5.isEmpty,
      "a dim delete must orphan its matched fact rows in place")

    // windows 3+4 — two fact merges and a dim merge BEFORE one
    // maintenance step: the step must catch up across all of them
    PartitionedUpsert.merge(spark, factDir,
      Seq((300L, 2L, "u", jLong(210L), jLong(10L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    PartitionedUpsert.merge(spark, factDir,
      Seq((400L, 6L, "c", jLong(600L), jLong(20L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 4)
    PartitionedUpsert.merge(spark, dimDir,
      Seq((500L, 20L, "u", "TWENTY")).toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    val jv = PartitionedUpsert.currentManifest(spark, joinDir).get.version
    val ((fF2, tF2), (fD2, tD2)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(tF2 - fF2 === 2L, "one step must span both fact versions")
    assert(tD2 - fD2 === 1L)
    assertCurrent(factDir, dimDir, joinDir)
    // both cursors land in ONE manifest write — no seam with one
    // cursor moved and the other stale
    val jm = PartitionedUpsert.currentManifest(spark, joinDir).get
    assert(jm.version === jv + 1)
    assert(jm.txns(s"cdf:$factDir") === tF2)
    assert(jm.txns(s"cdf:$dimDir") === tD2)

    // the inner view is the stored outer shape filtered to matched
    val inner = JoinMaintain.readJoin(spark, joinDir, inner = true)
    assert(!inner.columns.contains(JoinMaintain.markerCol("fk")))
    assert(inner.count() ===
      rows(JoinMaintain.readJoin(spark, joinDir)).count(_._4).toLong)
  }

  test("a current join is a zero-read no-op; foreign join dir rejected; " +
      "fullJoin guards fk membership and column clashes") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    seed(factDir, dimDir, joinDir)
    val v0 = PartitionedUpsert.currentManifest(spark, joinDir).get.version
    val ((fa, ta), (da, dta)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(fa === ta && da === dta)
    assert(PartitionedUpsert.currentManifest(spark, joinDir).get.version === v0,
      "an already-current join must not burn a version")
    // an upsert table never initJoin'ed from these sources
    val stray = freshDirs()._3
    PartitionedUpsert.init(
      Seq((1L, jLong(1L), jLong(10L))).toDF("pk", "cents", "fk"),
      stray, "pk", 2)
    intercept[IllegalStateException] {
      JoinMaintain.maintainJoin(spark, factDir, dimDir, stray)
    }
    val f = Seq((1L, jLong(1L), jLong(10L))).toDF("pk", "cents", "fk")
    val d = Seq((10L, "ten")).toDF("dk", "dname")
    intercept[IllegalArgumentException] {
      JoinMaintain.fullJoin(f, d, "pk", "other_fk", "dk", FactCols, DimCols)
    }
    intercept[IllegalArgumentException] {
      JoinMaintain.fullJoin(f, d.withColumnRenamed("dname", "cents"),
        "pk", "fk", "dk", FactCols, Seq("cents"))
    }
    // the standard same-name star-schema hazard: a dim KEY named like
    // the fact fk must get the clear alias-one-side error, not an
    // ambiguous-reference AnalysisException later
    intercept[IllegalArgumentException] {
      JoinMaintain.fullJoin(f, d.withColumnRenamed("dk", "fk"),
        "pk", "fk", "fk", FactCols, DimCols)
    }
  }

  test("the already-applied txn error carries the phrase maintainJoin's " +
      "retry matches on — rewording the require would silently disable " +
      "concurrent-maintainer recovery") {
    import spark.implicits._
    val (factDir, _, _) = freshDirs()
    PartitionedUpsert.init(
      Seq((1L, jLong(1L), jLong(10L))).toDF("pk", "cents", "fk"),
      factDir, "pk", 2)
    PartitionedUpsert.recordTxns(spark, factDir, Seq("app" -> 5L))
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.mergeWith(spark, factDir,
        Seq((9L, 2L, "c", jLong(2L), jLong(10L)))
          .toDF("lsn", "pk", "op", "cents", "fk"),
        "pk", "lsn", "op", FactCols, 2,
        // 5 already applied, 9 not: the partial-overlap path — the
        // all-applied fast path must NOT swallow it
        txns = Seq("app" -> 5L, "other" -> 9L))
    }
    assert(e.getMessage.contains("is already applied"),
      s"maintainJoin's retry matches on this phrase: ${e.getMessage}")
  }

  test("a dim window whose keys no join row references still advances " +
      "the dim cursor — an empty change log must not re-diff forever") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    seed(factDir, dimDir, joinDir)
    // dk=55: inserted, referenced by NO fact fk (not even the dangler)
    PartitionedUpsert.merge(spark, dimDir,
      Seq((300L, 55L, "c", "fiftyfive")).toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    val ((fF, tF), (fD, tD)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(fF === tF && fD < tD)
    // the cursor moved despite the empty change log: the next call is
    // the zero-read fast path, not a re-diff of the same window
    val ((f2, t2), (d2, dt2)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(f2 === t2 && d2 === dt2,
      "the unreferenced-dim window must be claimed, not re-examined")
    assertCurrent(factDir, dimDir, joinDir)
  }

  test("a zero-row-change window (both sources rebucketed) advances " +
      "both cursors in one metadata write — no eternal re-diff") {
    val (factDir, dimDir, joinDir) = freshDirs()
    seed(factDir, dimDir, joinDir)
    PartitionedUpsert.rebucket(spark, factDir, "pk", 8)
    PartitionedUpsert.rebucket(spark, dimDir, "dk", 4)
    val v0 = PartitionedUpsert.currentManifest(spark, joinDir).get.version
    val ((fF, tF), (fD, tD)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(fF < tF && fD < tD, "the step must claim the windows it examined")
    assert(PartitionedUpsert.currentManifest(spark, joinDir).get.version ===
      v0 + 1, "both cursors must advance in ONE manifest write")
    // cursors moved: the next call is the zero-read fast path
    val ((f2, t2), (d2, dt2)) =
      JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    assert(f2 === t2 && d2 === dt2)
    assertCurrent(factDir, dimDir, joinDir)
  }

  test("O(changes): a single-key fact window rewrites at most that " +
      "key's join bucket plus deletes' — untouched join buckets keep " +
      "their committed files") {
    import spark.implicits._
    val (factDir, dimDir, joinDir) = freshDirs()
    val fact = (0L until 64L)
      .map(i => (i, jLong(i * 100L), jLong(10L + (i % 3) * 10L)))
      .toDF("pk", "cents", "fk")
    val dim = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("dk", "dname")
    PartitionedUpsert.init(fact, factDir, "pk", 8)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    JoinMaintain.initJoin(spark, factDir, dimDir, joinDir, "fk", 8): Unit
    val before = PartitionedUpsert.currentManifest(spark, joinDir).get.buckets
    PartitionedUpsert.merge(spark, factDir,
      Seq((900L, 7L, "u", jLong(777L), jLong(20L)))
        .toDF("lsn", "pk", "op", "cents", "fk"),
      "pk", "lsn", "op", FactCols, 8)
    JoinMaintain.maintainJoin(spark, factDir, dimDir, joinDir)
    val after = PartitionedUpsert.currentManifest(spark, joinDir).get.buckets
    val rewritten = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(rewritten.size <= 1,
      s"a one-key window must rewrite <= 1 join bucket, got $rewritten")
    assertCurrent(factDir, dimDir, joinDir)
  }
}
