package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{AggMaintain, DagRead, JoinMaintain, PartitionedUpsert}

/** One continuous query advances the whole derived DAG — replica →
  * materialized join → aggregate-over-the-join — per trigger: after
  * every wave the aggregate must equal a from-scratch TWO-HOP
  * recompute (aggregate of a full re-join of the committed replica and
  * dim states), and a kill-and-resume at EACH hop boundary (after the
  * replica merge; after the join maintenance) must heal on restart
  * without double-applying or losing a window. */
class DagStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("cents", LongType),
    StructField("fk", LongType)))

  private def line(pk: Long, lsn: Long, op: String, cents: Long, fk: Long) =
    s"""{"pk":$pk,"lsn":$lsn,"op":"$op","cents":$cents,"fk":$fk}"""

  private def aggRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (Option(r.getAs[String]("dname")), r.getAs[Long]("cnt"),
      r.getAs[Long]("sum_cents")))
    .sortBy(_._1.getOrElse("")).toSeq

  /** The two-hop reference: aggregate of a full re-join of the two
    * committed base states — what the maintained chain must equal. */
  private def direct(factDir: String, dimDir: String) =
    aggRows(AggMaintain.exposed(
      AggMaintain.fullAggregate(
        JoinMaintain.fullJoin(
          PartitionedUpsert.read(spark, factDir),
          PartitionedUpsert.read(spark, dimDir),
          "pk", "fk", "dk", Seq("cents", "fk"), Seq("dname")),
        Seq("dname"), Seq("cents")),
      Seq("dname"), Seq("cents")))

  private def maintained(aggDir: String) =
    aggRows(AggMaintain.readAggregate(spark, aggDir))

  test("DAG pointer rides the trigger: readers see whole tuples only; a " +
      "crash between hops leaves them on the previous round's tuple, " +
      "which is internally CONSISTENT while the live tables are mixed") {
    import spark.implicits._
    import graft.ops.cdc.DagCommit
    val cvKey = "spark.sql.streaming.stateStore.commitValidation.enabled"
    val cvPrior = spark.conf.getOption(cvKey)
    spark.conf.set(cvKey, "false")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_dagpt").toString
      val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
      val (fDir, dDir, jDir, aDir, ckpt, dag) =
        (s"$base/fact", s"$base/dim", s"$base/join", s"$base/agg",
          s"$base/ckpt", s"$base/dag")
      PartitionedUpsert.init(
        Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname"), dDir, "dk", 2)
      def start(crashAfterHop: Int = 0) =
        CdcStream.maintainedDagSinkWithFailpoint(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .json(srcDir),
          fDir, dDir, jDir, aDir, ckpt, "pk", "lsn", "op",
          Seq("cents", "fk"), "fk", Seq("dname"), Seq("cents"),
          nBuckets = 4, joinBuckets = 4, aggBuckets = 2, crashAfterHop,
          dagDir = Some(dag))
      def pinnedAgg() = aggRows(AggMaintain.exposed(
        DagCommit.readTarget(spark, dag, "agg"), Seq("dname"), Seq("cents")))
      // a consistency probe that uses ONLY the pointer: aggregate of a
      // re-join of the PINNED fact against the dim must equal the
      // PINNED aggregate — the tuple is mutually consistent no matter
      // what the live tables are doing
      def pinnedDirect() = aggRows(AggMaintain.exposed(
        AggMaintain.fullAggregate(
          JoinMaintain.fullJoin(
            DagCommit.readTarget(spark, dag, "fact"),
            PartitionedUpsert.read(spark, dDir),
            "pk", "fk", "dk", Seq("cents", "fk"), Seq("dname")),
          Seq("dname"), Seq("cents")),
        Seq("dname"), Seq("cents")))

      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f1.json"),
        Seq(line(1, 10, "c", 100, 10), line(2, 11, "c", 200, 20))
          .mkString("\n"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val dag1 = DagCommit.currentDag(spark, dag).get
      assert(pinnedAgg() === direct(fDir, dDir))
      assert(pinnedAgg() === pinnedDirect())

      // crash AFTER the join hop: fact and join move, agg does not,
      // and the POINTER does not — a pointer reader keeps the whole
      // previous tuple, and that tuple stays internally consistent
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f2.json"),
        Seq(line(3, 20, "c", 300, 10)).mkString("\n"))
      val before = pinnedAgg()
      val q2 = start(crashAfterHop = 2)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
          q2.awaitTermination(10000L): Unit
          throw q2.exception.getOrElse(fail("failpoint did not fire"))
        }
      } finally q2.stop()
      val cur = DagCommit.currentDag(spark, dag).get
      assert(cur.version === dag1.version, "pointer must not move mid-round")
      assert(PartitionedUpsert.manifestOrFail(spark, fDir).version >
        cur.pins("fact").version, "the live fact must actually be ahead")
      assert(pinnedAgg() === before)
      assert(pinnedAgg() === pinnedDirect(),
        "the pinned tuple must stay consistent while live tables are mixed")
      assert(pinnedAgg() !== direct(fDir, dDir),
        "the live tables must actually be mixed for this test to bite")

      // restart heals the hops and swaps the pointer once, atomically
      val q3 = start()
      try q3.processAllAvailable() finally q3.stop()
      val healed = DagCommit.currentDag(spark, dag).get
      assert(healed.version > dag1.version)
      assert(pinnedAgg() === direct(fDir, dDir))
      assert(pinnedAgg() === pinnedDirect())
      healed.pins.foreach { case (n, p) =>
        assert(PartitionedUpsert.manifestOrFail(spark, p.dir).version ==
          p.version, s"healed pointer must pin '$n' at its current version")
      }
    } finally {
      cvPrior match {
        case Some(v) => spark.conf.set(cvKey, v)
        case None    => spark.conf.unset(cvKey)
      }
    }
  }

  test("replica -> join -> aggregate stay in lockstep across triggers, " +
      "an out-of-band dim change, and a crash at EACH hop boundary") {
    import spark.implicits._
    // the commit-validation guard (for foreachBatch bodies that swallow
    // exceptions) false-positives on an IN-PROCESS replay of an
    // intentionally aborted batch: the crashed run's state-store
    // provider still holds the dropDuplicates delta it committed before
    // the failpoint fired, so the restarted run's commit count comes up
    // short. A real driver death reloads providers from the checkpoint
    // and never trips it — disable for this spec only.
    val cvKey = "spark.sql.streaming.stateStore.commitValidation.enabled"
    val cvPrior = spark.conf.getOption(cvKey)
    spark.conf.set(cvKey, "false")
    try {
    val base = java.nio.file.Files.createTempDirectory("graft_dagst").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (fDir, dDir, jDir, aDir, ckpt) =
      (s"$base/fact", s"$base/dim", s"$base/join", s"$base/agg", s"$base/ckpt")
    PartitionedUpsert.init(
      Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "dname"), dDir, "dk", 2)
    def start(crashAfterHop: Int = 0) =
      CdcStream.maintainedDagSinkWithFailpoint(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .json(srcDir),
        fDir, dDir, jDir, aDir, ckpt, "pk", "lsn", "op",
        Seq("cents", "fk"), "fk", Seq("dname"), Seq("cents"),
        nBuckets = 4, joinBuckets = 4, aggBuckets = 2, crashAfterHop)
    def runCrashing(crashAfterHop: Int): Unit = {
      val q = start(crashAfterHop)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
          // processAllAvailable returns on failure too (no data left to
          // process) — surface the batch's exception explicitly
          q.awaitTermination(10000L): Unit
          throw q.exception.getOrElse(
            fail(s"failpoint $crashAfterHop did not fire"))
        }
      } finally q.stop()
    }

    // wave 1: two triggers — matched groups plus a dangling fk (the
    // NULL-dname group, a real group the agg must carry)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(line(1, 10, "c", 100, 10), line(2, 11, "c", 200, 20),
        line(3, 12, "c", 300, 99)).mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(line(1, 20, "u", 110, 20), line(4, 21, "c", 400, 10))
        .mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill between waves
    assert(maintained(aDir) === direct(fDir, dDir))
    assert(maintained(aDir) === Seq(
      (None, 1L, 300L), (Some("ten"), 1L, 400L), (Some("twenty"), 2L, 310L)))

    // boundary 1: crash AFTER the replica merge, BEFORE the join hop —
    // the replica is ahead; join and aggregate still read their
    // previous committed states (the old aligned point, DagRead-style)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(line(2, 30, "u", 210, 10), line(5, 31, "c", 500, 20))
        .mkString("\n"))
    val before1 = maintained(aDir)
    runCrashing(crashAfterHop = 1)
    assert(maintained(aDir) === before1,
      "a crash before the join hop must leave the old aggregate readable")
    assert(maintained(aDir) !== direct(fDir, dDir),
      "the replica must actually be ahead after the hop-1 crash")
    // restart heals: the batch replays — merge is a txn no-op, both
    // maintenance hops catch up
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(maintained(aDir) === direct(fDir, dDir),
      "restart after a hop-1 crash must not double-apply or lose a window")
    assert(maintained(aDir) === Seq(
      (None, 1L, 300L), (Some("ten"), 2L, 610L), (Some("twenty"), 2L, 610L)))

    // boundary 2: crash AFTER the join hop, BEFORE the aggregate —
    // replica and join are ahead, the aggregate one version behind
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f4.json"),
      Seq(line(3, 40, "d", 0, 99), line(6, 41, "c", 600, 10))
        .mkString("\n"))
    val before2 = maintained(aDir)
    runCrashing(crashAfterHop = 2)
    assert(maintained(aDir) === before2,
      "a crash before the aggregate hop must leave the old aggregate readable")
    assert(JoinMaintain.readJoin(spark, jDir).count() == 5,
      "the join hop must have landed before the hop-2 crash")
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(maintained(aDir) === direct(fDir, dDir),
      "restart after a hop-2 crash must not double-apply or lose a window")

    // out-of-band dim change while the stream is down: the rename
    // migrates groups; the next fact trigger ripples it through BOTH
    // hops (join CDF -> aggregate delta)
    PartitionedUpsert.merge(spark, dDir,
      Seq((100L, 10L, "u", "TEN")).toDF("lsn", "dk", "op", "dname"),
      "dk", "lsn", "op", Seq("dname"), 2)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f5.json"),
      Seq(line(7, 50, "c", 700, 20)).mkString("\n"))
    val q4 = start()
    try q4.processAllAvailable() finally q4.stop()
    assert(maintained(aDir) === direct(fDir, dDir),
      "an out-of-band dim rename must ripple through both hops")
    assert(maintained(aDir).map(_._1).contains(Some("TEN")))
    assert(!maintained(aDir).map(_._1).contains(Some("ten")))

    // and the DagRead contract holds over the streaming-maintained
    // chain: the join's fact cursor and the agg's join cursor both
    // expose retained consistent points
    val p = DagRead.consistentPoint(spark, Seq(jDir),
      PartitionedUpsert.cdfApp(fDir))
    assert(p.nonEmpty, "the join must expose fact-cursor points")
    val pa = DagRead.consistentPoint(spark, Seq(aDir),
      PartitionedUpsert.cdfApp(jDir))
    assert(pa.nonEmpty, "the aggregate must expose join-cursor points")
    } finally {
      // restore even on a failing assert — the session is shared across
      // suites, and leaking a disabled commit-validation guard would
      // mask exactly the foreachBatch bugs it exists to catch
      cvPrior match {
        case Some(v) => spark.conf.set(cvKey, v)
        case None    => spark.conf.unset(cvKey)
      }
    }
  }
}
