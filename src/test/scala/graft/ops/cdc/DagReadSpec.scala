package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-target read consistency over the derived-table DAG: a
  * consistent (aggregate, join) snapshot w.r.t. the shared source
  * exists at ALL times — walked through a crash at EVERY inter-target
  * seam of every coordinated round — and the SCD2 history/open pair
  * gets the same guarantee from its shared batch transaction. */
class DagReadSpec extends SparkSpec {

  private val G = Seq("grp")
  private val S = Seq("v")
  private val FactCols = Seq("grp", "v", "fk")
  private val DimCols = Seq("dname")

  private def dirs(): (String, String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_dagread").toString
    (s"$base/src", s"$base/dim", s"$base/agg", s"$base/join")
  }

  private def jLong(v: Long): java.lang.Long = java.lang.Long.valueOf(v)

  private def aggRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
      Option(r.getAs[java.lang.Long]("sum_v")).map(_.longValue)))
    .sortBy(_._1).toSeq

  private def joinRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("pk"), r.getAs[String]("grp"),
      Option(r.getAs[java.lang.Long]("v")).map(_.longValue),
      Option(r.getAs[java.lang.Long]("fk")).map(_.longValue),
      Option(r.getAs[String]("dname"))))
    .sortBy(_._1).toSeq

  /** The consistency invariant: a common point exists, and BOTH
    * targets read at it equal recomputes from the SOURCE state at that
    * very version (the dim is read current — fact-consistency is the
    * certified property). */
  private def assertConsistent(srcDir: String, dimDir: String,
                               aggDir: String, joinDir: String): Long = {
    val key = PartitionedUpsert.cdfApp(srcDir)
    val (p, reads) = DagRead.readConsistent(
      spark, Seq(aggDir, joinDir), key).getOrElse(
      fail(s"no consistent point across $aggDir and $joinDir"))
    val srcAt = PartitionedUpsert.readVersion(spark, srcDir, p)
    assert(aggRows(AggMaintain.exposed(reads(aggDir), G, S)) ===
      aggRows(AggMaintain.exposed(
        AggMaintain.fullAggregate(srcAt, G, S), G, S)),
      s"aggregate at point $p must equal recompute from source v$p")
    assert(joinRows(reads(joinDir)) ===
      joinRows(JoinMaintain.fullJoin(srcAt,
        PartitionedUpsert.read(spark, dimDir),
        "pk", "fk", "dk", FactCols, DimCols)),
      s"join at point $p must equal re-join from source v$p")
    p
  }

  test("a consistent cross-target read exists at every seam of every round") {
    import spark.implicits._
    val (srcDir, dimDir, aggDir, joinDir) = dirs()
    val snap = Seq(
      (1L, "a", jLong(10L), jLong(10L)),
      (2L, "a", jLong(20L), jLong(20L)),
      (3L, "b", jLong(30L), jLong(10L))
    ).toDF("pk", "grp", "v", "fk")
    val dim = Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname")
    PartitionedUpsert.init(snap, srcDir, "pk", 4)
    PartitionedUpsert.init(dim, dimDir, "dk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    JoinMaintain.initJoin(spark, srcDir, dimDir, joinDir, "fk", 4): Unit
    // both seeds pinned to source v1 → the first aligned point
    assert(assertConsistent(srcDir, dimDir, aggDir, joinDir) == 1L)

    var lsn = 100L
    for (round <- 1 to 3) {
      // one source window: insert + update + delete across groups
      PartitionedUpsert.merge(spark, srcDir,
        Seq((lsn, 10L + round, "i", "c", jLong(5L * round), jLong(10L)),
          (lsn + 1, 1L, "u", "a", jLong(11L * round), jLong(20L)),
          (lsn + 2, 3L, if (round == 2) "d" else "u", "b",
            jLong(31L * round), jLong(10L)))
          .toDF("lsn", "pk", "op", "grp", "v", "fk"),
        "pk", "lsn", "op", FactCols, 4)
      lsn += 10
      val sv = PartitionedUpsert.manifestOrFail(spark, srcDir).version
      val before = assertConsistent(srcDir, dimDir, aggDir, joinDir)
      assert(before < sv, "the new source version is not yet propagated")

      // seam 1: CRASH after the aggregate advanced, before the join —
      // the consistent point must hold at the PREVIOUS aligned version
      AggMaintain.maintainAggregate(spark, srcDir, aggDir, Some(sv)): Unit
      val mid = assertConsistent(srcDir, dimDir, aggDir, joinDir)
      assert(mid == before,
        "a half-propagated round must expose the previous aligned point")

      // recovery: the rest of the round lands (idempotent — rerunning
      // the aggregate step replays as a metadata no-op inside
      // alignedRound)
      val landed = DagRead.alignedRound(spark, srcDir,
        aggDirs = Seq(aggDir), joins = Seq((dimDir, joinDir)))
      assert(landed == sv)
      assert(assertConsistent(srcDir, dimDir, aggDir, joinDir) == sv,
        "a completed round must advance the consistent point")
    }
  }

  test("seam order reversed: join first, then crash — same guarantee") {
    import spark.implicits._
    val (srcDir, dimDir, aggDir, joinDir) = dirs()
    val snap = Seq((1L, "a", jLong(1L), jLong(10L)))
      .toDF("pk", "grp", "v", "fk")
    PartitionedUpsert.init(snap, srcDir, "pk", 2)
    PartitionedUpsert.init(Seq((10L, "ten")).toDF("dk", "dname"),
      dimDir, "dk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    JoinMaintain.initJoin(spark, srcDir, dimDir, joinDir, "fk", 2): Unit
    PartitionedUpsert.merge(spark, srcDir,
      Seq((5L, 2L, "i", "a", jLong(2L), jLong(10L)))
        .toDF("lsn", "pk", "op", "grp", "v", "fk"),
      "pk", "lsn", "op", FactCols, 2)
    val sv = PartitionedUpsert.manifestOrFail(spark, srcDir).version
    JoinMaintain.maintainJoin(spark, srcDir, dimDir, joinDir,
      toFact = Some(sv)): Unit
    // join ahead, aggregate behind — previous point still readable
    assert(assertConsistent(srcDir, dimDir, aggDir, joinDir) == 1L)
    AggMaintain.maintainAggregate(spark, srcDir, aggDir, Some(sv)): Unit
    assert(assertConsistent(srcDir, dimDir, aggDir, joinDir) == sv)
  }

  test("a dim-only advance re-points the SAME fact cursor at the newer state") {
    import spark.implicits._
    val (srcDir, dimDir, aggDir, joinDir) = dirs()
    PartitionedUpsert.init(
      Seq((1L, "a", jLong(1L), jLong(10L))).toDF("pk", "grp", "v", "fk"),
      srcDir, "pk", 2)
    PartitionedUpsert.init(Seq((10L, "ten")).toDF("dk", "dname"),
      dimDir, "dk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    JoinMaintain.initJoin(spark, srcDir, dimDir, joinDir, "fk", 2): Unit
    PartitionedUpsert.merge(spark, dimDir,
      Seq((7L, 10L, "u", "TEN")).toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", DimCols, 2)
    JoinMaintain.maintainJoin(spark, srcDir, dimDir, joinDir): Unit
    // the fact cursor still reads 1 — and the state at that point now
    // carries the newer dim (max-table-version-per-cursor semantics:
    // fact-consistency certified, dim rides current)
    val p = assertConsistent(srcDir, dimDir, aggDir, joinDir)
    assert(p == 1L)
    val key = PartitionedUpsert.cdfApp(srcDir)
    val dn = DagRead.readAt(spark, joinDir, key, p)
      .select("dname").collect().map(_.getString(0)).toSeq
    assert(dn == Seq("TEN"))
  }

  test("readAt is loud on a missing point; empty targets have no point") {
    import spark.implicits._
    val (srcDir, _, aggDir, _) = dirs()
    PartitionedUpsert.init(
      Seq((1L, "a", jLong(1L), jLong(10L))).toDF("pk", "grp", "v", "fk"),
      srcDir, "pk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    val key = PartitionedUpsert.cdfApp(srcDir)
    val e = intercept[IllegalArgumentException] {
      DagRead.readAt(spark, aggDir, key, 99L)
    }
    assert(e.getMessage.contains("no retained state"))
    assert(DagRead.consistentPoint(spark, Seq(aggDir), "cdf:/nowhere").isEmpty)
  }

  test("SCD2 history/open pair: the shared batch txn is a consistency point " +
      "across the crash seam between the two merges") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_dagscd2").toString
    val (hDir, oDir) = (s"$base/hist", s"$base/open")
    val V = Seq("v")
    def batch(rows: Seq[(Long, Long, Long, Double)]) =
      rows.toDF("pk", "lsn", "ts", "v")
    val b1 = batch(Seq((1L, 1L, 100L, 1.0), (2L, 2L, 100L, 2.0)))
    val b2 = batch(Seq((1L, 3L, 200L, 1.5)))
    Scd2Maintain.init(b1, hDir, oDir, "pk", "lsn", "ts", V, nBuckets = 2)
    Scd2Maintain.applyBatch(spark, hDir, oDir, b1, "pk", "lsn", "ts", V, 2,
      txn = Some(("scd2sink", 1L)))
    val pair = Seq(hDir, oDir)
    assert(DagRead.consistentPoint(spark, pair, "scd2sink") == Some(1L))
    val h1 = DagRead.readAt(spark, hDir, "scd2sink", 1L).count()

    // crash BETWEEN the history merge and the open merge: history is
    // at batch 2, open still at batch 1 — the pair's consistent point
    // must hold at 1, and history AT 1 is the pre-crash state
    intercept[RuntimeException] {
      Scd2Maintain.applyBatchWithFailpoint(spark, hDir, oDir, b2,
        "pk", "lsn", "ts", V, 2, txn = Some(("scd2sink", 2L)),
        crashAfterHistory = true)
    }
    assert(DagRead.consistentPoint(spark, pair, "scd2sink") == Some(1L))
    assert(DagRead.readAt(spark, hDir, "scd2sink", 1L).count() == h1)

    // replay heals; the point advances
    Scd2Maintain.applyBatch(spark, hDir, oDir, b2, "pk", "lsn", "ts", V, 2,
      txn = Some(("scd2sink", 2L)))
    assert(DagRead.consistentPoint(spark, pair, "scd2sink") == Some(2L))
  }
}
