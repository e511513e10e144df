package graft.ops.cdc

import graft.SparkSpec

/** Atomic multi-target commit through the DAG pointer: a reader of
  * [[DagCommit.read]] can NEVER observe sibling targets at different
  * source versions — the gap a direct per-table reader still has —
  * because visibility moves only at the single pointer swap, and
  * advanceAligned refuses to publish a half-completed round. */
class DagCommitSpec extends SparkSpec {

  private val G = Seq("grp")
  private val S = Seq("v")
  private val FactCols = Seq("grp", "v", "fk")

  private def dirs(): (String, String, String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_dagcommit").toString
    (s"$base/src", s"$base/dim", s"$base/agg", s"$base/join", s"$base/dag")
  }

  private def jLong(v: Long): java.lang.Long = java.lang.Long.valueOf(v)

  private def fixture(): (String, String, String, String, String) = {
    import spark.implicits._
    val (srcDir, dimDir, aggDir, joinDir, dagDir) = dirs()
    val snap = Seq(
      (1L, "a", jLong(10L), jLong(10L)),
      (2L, "b", jLong(20L), jLong(20L))).toDF("pk", "grp", "v", "fk")
    PartitionedUpsert.init(snap, srcDir, "pk", 2)
    PartitionedUpsert.init(
      Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname"), dimDir, "dk", 2)
    AggMaintain.initAggregate(spark, srcDir, aggDir, G, S, nBuckets = 2)
    JoinMaintain.initJoin(spark, srcDir, dimDir, joinDir, "fk", 2): Unit
    (srcDir, dimDir, aggDir, joinDir, dagDir)
  }

  private def mergeSource(srcDir: String, lsn: Long): Long = {
    import spark.implicits._
    PartitionedUpsert.merge(spark, srcDir,
      Seq((lsn, 3L, "i", "a", jLong(7L), jLong(20L)),
        (lsn + 1, 1L, "u", "a", jLong(11L), jLong(10L)))
        .toDF("lsn", "pk", "op", "grp", "v", "fk"),
      "pk", "lsn", "op", FactCols, 2)
    PartitionedUpsert.manifestOrFail(spark, srcDir).version
  }

  /** The invariant: every member of the snapshot records the SAME
    * source cursor — mixed tuples are unobservable through the pointer. */
  private def pinnedCursor(dagDir: String, srcDir: String): Long = {
    val key = PartitionedUpsert.cdfApp(srcDir)
    val (m, _) = DagCommit.read(spark, dagDir)
    val cursors = m.pins.map { case (n, p) =>
      val recorded = PartitionedUpsert.manifestAt(spark, p.dir, p.version)
        .txns.get(key)
      assert(recorded.isDefined, s"member $n pins a version with no cursor")
      recorded.get
    }.toSet
    assert(cursors.size == 1,
      s"pointer exposed members at DIFFERENT source versions: $cursors")
    cursors.head
  }

  test("init pins current versions; read and readTarget serve them; unknown target is loud") {
    val (srcDir, _, aggDir, joinDir, dagDir) = fixture()
    val m = DagCommit.init(spark, dagDir,
      Map("agg" -> aggDir, "join" -> joinDir))
    assert(m.version == 1L && m.pins.keySet == Set("agg", "join"))
    assert(pinnedCursor(dagDir, srcDir) == 1L)
    val direct = PartitionedUpsert.read(spark, joinDir)
    val viaDag = DagCommit.readTarget(spark, dagDir, "join")
    assert(viaDag.exceptAll(direct).isEmpty && direct.exceptAll(viaDag).isEmpty)
    val e = intercept[IllegalArgumentException] {
      DagCommit.readTarget(spark, dagDir, "nope")
    }
    assert(e.getMessage.contains("no target 'nope'"))
    intercept[IllegalStateException] {
      DagCommit.init(spark, dagDir, Map("agg" -> aggDir))
    }: Unit
  }

  test("crash between hops: the pointer refuses the mixed tuple and readers stay consistent") {
    val (srcDir, dimDir, aggDir, joinDir, dagDir) = fixture()
    DagCommit.init(spark, dagDir, Map("agg" -> aggDir, "join" -> joinDir)): Unit
    val key = PartitionedUpsert.cdfApp(srcDir)

    val sv = mergeSource(srcDir, 100L)
    // hop 1 lands, then the round "crashes" before hop 2
    AggMaintain.maintainAggregate(spark, srcDir, aggDir, Some(sv)): Unit
    // the DIRECT current reads are now mixed...
    assert(PartitionedUpsert.manifestOrFail(spark, aggDir).txns(key) == sv)
    assert(PartitionedUpsert.manifestOrFail(spark, joinDir).txns(key) < sv)
    // ...but the pointer cannot publish that tuple
    val e = intercept[IllegalStateException] {
      DagCommit.advanceAligned(spark, dagDir, key, sv)
    }
    assert(e.getMessage.contains("refusing to publish a mixed tuple"))
    // and pointer readers still see the previous round whole
    assert(pinnedCursor(dagDir, srcDir) == 1L)

    // recovery: hop 2 lands, the aligned publish succeeds as a unit
    JoinMaintain.maintainJoin(spark, srcDir, dimDir, joinDir,
      toFact = Some(sv)): Unit
    val m2 = DagCommit.advanceAligned(spark, dagDir, key, sv)
    assert(m2.version == 2L)
    assert(pinnedCursor(dagDir, srcDir) == sv)
  }

  test("no advance, no movement: pointer reads are isolated from target progress") {
    val (srcDir, dimDir, aggDir, joinDir, dagDir) = fixture()
    DagCommit.init(spark, dagDir, Map("agg" -> aggDir, "join" -> joinDir)): Unit
    val before = DagCommit.readTarget(spark, dagDir, "agg").collect().toSet
    // two full rounds advance every target — the pointer still serves v1
    for (i <- 0 to 1) {
      val sv = mergeSource(srcDir, 200L + 10 * i)
      AggMaintain.maintainAggregate(spark, srcDir, aggDir, Some(sv)): Unit
      JoinMaintain.maintainJoin(spark, srcDir, dimDir, joinDir,
        toFact = Some(sv)): Unit
    }
    assert(DagCommit.readTarget(spark, dagDir, "agg").collect().toSet == before)
    assert(pinnedCursor(dagDir, srcDir) == 1L)
    // one advance() exposes the current tuple atomically
    val m = DagCommit.advance(spark, dagDir)
    assert(m.version == 2L)
    assert(DagCommit.readTarget(spark, dagDir, "agg").collect().toSet != before)
  }

  test("racing publishes collide on the versioned pointer file") {
    val (_, _, aggDir, joinDir, dagDir) = fixture()
    val m1 = DagCommit.init(spark, dagDir, Map("agg" -> aggDir, "join" -> joinDir))
    DagCommit.advance(spark, dagDir): Unit // v2 lands
    // a stale writer re-publishing v2 must get a clean conflict
    intercept[java.util.ConcurrentModificationException] {
      DagCommit.publish(spark, dagDir, m1.copy(version = 2L))
    }: Unit
  }

  test("vacuumDag bounds the pointer history; current stays readable") {
    val (_, _, aggDir, joinDir, dagDir) = fixture()
    DagCommit.init(spark, dagDir, Map("agg" -> aggDir, "join" -> joinDir)): Unit
    (1 to 4).foreach(_ => DagCommit.advance(spark, dagDir): Unit)
    DagCommit.vacuumDag(spark, dagDir, keepVersions = 2)
    val cur = DagCommit.currentDag(spark, dagDir).get
    assert(cur.version == 5L)
    assert(DagCommit.read(spark, dagDir)._2.keySet == Set("agg", "join"))
  }

  test("vacuumMembers widens each member's retention to cover retained " +
      "pins; a raw member vacuum is exactly the stranding error") {
    val (srcDir, dimDir, aggDir, joinDir, dagDir) = fixture()
    DagCommit.init(spark, dagDir, Map("agg" -> aggDir, "join" -> joinDir)): Unit
    // three coordinated rounds: the agg table moves one version per
    // round while the pointer retains only the last two tuples
    (0 to 2).foreach { i =>
      val v = mergeSource(srcDir, 100L + i * 10)
      AggMaintain.maintainAggregate(spark, srcDir, aggDir, Some(v)): Unit
      JoinMaintain.maintainJoin(spark, srcDir, dimDir, joinDir,
        toFact = Some(v)): Unit
      DagCommit.advance(spark, dagDir): Unit
      DagCommit.vacuumDag(spark, dagDir, keepVersions = 2)
    }
    // the retained OLDER pointer pins the agg one version behind
    // current (one maintain per round, one advance per round)
    val aggCur = PartitionedUpsert.manifestOrFail(spark, aggDir).version
    val olderPin = aggCur - 1
    // the pin-aware sweep keeps the older pin resolvable
    DagCommit.vacuumMembers(spark, dagDir, keepVersions = 2,
      minStagingAgeMs = 0L)
    assert(DagCommit.readTarget(spark, dagDir, "agg").count() >= 0)
    assert(PartitionedUpsert.readVersion(spark, aggDir, olderPin).count() >= 0,
      "the previous retained pointer's pin must survive the sweep")
    // contrast: a raw keep-1 vacuum on the member strands that pin —
    // the operator error the helper exists to prevent
    PartitionedUpsert.vacuum(spark, aggDir, keepManifests = 1,
      minStagingAgeMs = 0L)
    intercept[IllegalArgumentException] {
      PartitionedUpsert.readVersion(spark, aggDir, olderPin).count()
    }
  }
}
