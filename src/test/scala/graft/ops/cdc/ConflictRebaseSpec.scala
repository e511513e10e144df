package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Commit-conflict AUTO-REBASE (r16 verdict #4): two concurrent
  * merges from the same base both land when their touched buckets are
  * disjoint — the loser republishes as winner+1 without re-preparing;
  * a genuine overlap (or a shape change) still errors loudly. */
class ConflictRebaseSpec extends SparkSpec {

  private def initTable(dir: String): Unit = {
    import spark.implicits._
    PartitionedUpsert.init(
      (1L to 40L).map(k => (k, k * 10L)).toDF("k", "v"), dir, "k", 4)
  }

  /** The table's own routing for a literal key (4 hash buckets). */
  private def bucketOf(k: Long): Long = {
    import spark.implicits._
    Seq(k).toDF("k")
      .select(PartitionedUpsert.bucketOf(col("k"), 4)).head().getLong(0)
  }

  private def changes(lsn: Long, k: Long, v: Long) = {
    import spark.implicits._
    Seq((lsn, k, "u", v)).toDF("lsn", "k", "op", "v")
  }

  private def state(dir: String): Map[Long, Long] =
    PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("disjoint-bucket racers BOTH land: the loser auto-rebases as " +
      "winner+1, keeping the winner's data, its own rewrite, and its " +
      "txn cursor — no re-prepare") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase").toString
    initTable(dir)
    // two keys routing to DIFFERENT buckets
    val k1 = (1L to 40L).find(k => bucketOf(k) == 0L).get
    val k2 = (1L to 40L).find(k => bucketOf(k) == 1L).get
    val p1 = PartitionedUpsert.prepare(spark, dir, changes(100L, k1, 111L),
      "k", "lsn", "op", Seq("v"), 4)
    val p2 = PartitionedUpsert.prepare(spark, dir, changes(100L, k2, 222L),
      "k", "lsn", "op", Seq("v"), 4, txn = Some("racer2" -> 7L))
    PartitionedUpsert.commit(spark, dir, p1) // wins: v2
    PartitionedUpsert.commit(spark, dir, p2) // conflicts → rebases: v3
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.version == 3L)
    assert(m.txns.get("racer2").contains(7L),
      "the rebased commit must carry the loser's txn cursor")
    val st = state(dir)
    assert(st(k1) == 111L, "the winner's merge survives the rebase")
    assert(st(k2) == 222L, "the rebased merge lands")
    assert(st.size == 40, "no other key was disturbed")
  }

  test("SAME-BUCKET racers on DISJOINT KEYS both land (r19 key-level " +
      "rebase): the loser diffs both rewrites against the base, " +
      "proves the change-key sets disjoint, and composes the bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_kb").toString
    initTable(dir)
    val k1 = (1L to 40L).find(k => bucketOf(k) == 2L).get
    val k2 = (k1 + 1L to 40L).find(k => bucketOf(k) == 2L).get // same bucket
    val p1 = PartitionedUpsert.prepare(spark, dir, changes(100L, k1, 111L),
      "k", "lsn", "op", Seq("v"), 4)
    val p2 = PartitionedUpsert.prepare(spark, dir, changes(100L, k2, 222L),
      "k", "lsn", "op", Seq("v"), 4, txn = Some("racer2" -> 9L))
    PartitionedUpsert.commit(spark, dir, p1)
    PartitionedUpsert.commit(spark, dir, p2) // key-level rebase: v3
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.version == 3L)
    assert(m.txns.get("racer2").contains(9L),
      "the composed commit must carry the loser's txn cursor")
    val st = state(dir)
    assert(st(k1) == 111L, "the winner's same-bucket change survives")
    assert(st(k2) == 222L, "the loser's change composes in")
    assert(st.size == 40, "no other key was disturbed")
  }

  test("SAME-KEY racers: the loser still gets the loud conflict " +
      "error, and its changes do NOT land (key-level rebase refuses " +
      "a genuine overlap)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_ov").toString
    initTable(dir)
    val k1 = (1L to 40L).find(k => bucketOf(k) == 2L).get
    val p1 = PartitionedUpsert.prepare(spark, dir, changes(100L, k1, 111L),
      "k", "lsn", "op", Seq("v"), 4)
    val p2 = PartitionedUpsert.prepare(spark, dir, changes(100L, k1, 222L),
      "k", "lsn", "op", Seq("v"), 4)
    PartitionedUpsert.commit(spark, dir, p1)
    val e = intercept[java.util.ConcurrentModificationException] {
      PartitionedUpsert.commit(spark, dir, p2)
    }
    assert(e.getMessage.contains("also changed bucket"))
    val st = state(dir)
    assert(st(k1) == 111L)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 2L,
      "the refused merge must not leak")
  }

  test("key-level rebase composes DELETES and INSERTS too: racer A " +
      "deletes one key while racer B inserts a new key routing to the " +
      "SAME bucket; both land, lsn ceiling is the max of both sides") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_di").toString
    initTable(dir)
    val kDel = (1L to 40L).find(k => bucketOf(k) == 1L).get
    val kIns = (41L to 400L).find(k => bucketOf(k) == 1L).get // new key
    val pDel = PartitionedUpsert.prepare(spark, dir,
      changes(100L, kDel, 0L).withColumn("op", lit("d")),
      "k", "lsn", "op", Seq("v"), 4)
    val pIns = PartitionedUpsert.prepare(spark, dir,
      changes(200L, kIns, 4444L), "k", "lsn", "op", Seq("v"), 4)
    PartitionedUpsert.commit(spark, dir, pDel)
    PartitionedUpsert.commit(spark, dir, pIns) // composes over the delete
    val st = state(dir)
    assert(!st.contains(kDel), "the winner's delete survives")
    assert(st(kIns) == 4444L, "the loser's insert composes in")
    assert(st.size == 40, "39 originals + 1 insert")
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val b = bucketOf(kDel)
    assert(m.stats.get(b).flatMap(_.maxLsn).contains(200L),
      s"composed lsn ceiling is the max of both sides: ${m.stats.get(b)}")
  }

  test("a SHAPE change between prepare and commit refuses the rebase: " +
      "a new CHECK constraint must re-validate the loser's rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_ck").toString
    initTable(dir)
    val k1 = (1L to 40L).find(k => bucketOf(k) == 0L).get
    val p = PartitionedUpsert.prepare(spark, dir, changes(100L, k1, -5L),
      "k", "lsn", "op", Seq("v"), 4)
    PartitionedUpsert.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val e = intercept[java.util.ConcurrentModificationException] {
      PartitionedUpsert.commit(spark, dir, p)
    }
    assert(e.getMessage.contains("CHECK constraints changed"))
    assert(state(dir)(k1) == k1 * 10L)
  }

  test("a prepared merge rebases over a deleteMor winner on OTHER " +
      "buckets (GDPR sweep racing ingest): tombstones AND the merge " +
      "both land; a same-bucket DIFFERENT-key tombstone composes via " +
      "the key-level rebase; a tombstone on the merge's own KEY refuses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_mor").toString
    initTable(dir)
    val kDel = (1L to 40L).find(k => bucketOf(k) == 3L).get
    val kUp = (1L to 40L).find(k => bucketOf(k) == 0L).get
    val p = PartitionedUpsert.prepare(spark, dir, changes(100L, kUp, 111L),
      "k", "lsn", "op", Seq("v"), 4)
    // the sweep wins the race: v2 adds a sidecar on bucket 3
    PartitionedUpsert.deleteMor(spark, dir, Seq(kDel).toDF("k"), "k"): Unit
    PartitionedUpsert.commit(spark, dir, p) // rebases: v3
    val st = state(dir)
    assert(!st.contains(kDel), "the tombstone survives the rebase")
    assert(st(kUp) == 111L, "the rebased merge lands")
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == 3L)
    // same bucket, DIFFERENT key: the sweep tombstones kUp while the
    // prepared merge updates kUp2 — the key-level rebase (r19) diffs
    // both sides against base, proves {kUp} ∩ {kUp2} = ∅, and
    // composes: the tombstone is physicalized into the composed file
    val kUp2 = (kUp + 1L to 40L).find(k => bucketOf(k) == 0L).get
    val p2 = PartitionedUpsert.prepare(spark, dir, changes(101L, kUp2, 222L),
      "k", "lsn", "op", Seq("v"), 4)
    PartitionedUpsert.deleteMor(spark, dir, Seq(kUp).toDF("k"), "k"): Unit
    PartitionedUpsert.commit(spark, dir, p2)
    val st2 = state(dir)
    assert(!st2.contains(kUp), "the sweep's tombstone survives the compose")
    assert(st2(kUp2) == 222L, "the merge's same-bucket change lands")
    assert(st2.size == st.size - 1, "only kUp was removed")
    // GENUINE overlap: a sweep deleting the very key the prepared
    // merge updates is a real conflict — the loud error stands
    val kUp3 = (kUp2 + 1L to 40L).find(k => bucketOf(k) == 0L).get
    val p3 = PartitionedUpsert.prepare(spark, dir, changes(102L, kUp3, 333L),
      "k", "lsn", "op", Seq("v"), 4)
    PartitionedUpsert.deleteMor(spark, dir, Seq(kUp3).toDF("k"), "k"): Unit
    val e = intercept[java.util.ConcurrentModificationException] {
      PartitionedUpsert.commit(spark, dir, p3)
    }
    assert(e.getMessage.contains("also changed bucket"))
    assert(!state(dir).contains(kUp3), "the refused merge must not leak")
  }

  test("CONCURRENT deleteMor and merge threads on disjoint buckets: " +
      "whichever loses the publish race rebases — both effects land, " +
      "every round, no conflict surfaces") {
    import spark.implicits._
    (1 to 3).foreach { round =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_rebase_thr$round").toString
      initTable(dir)
      val kDel = (1L to 40L).find(k => bucketOf(k) == 3L).get
      val kUp = (1L to 40L).find(k => bucketOf(k) == 1L).get
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try PartitionedUpsert.deleteMor(spark, dir,
          Seq(kDel).toDF("k"), "k"): Unit
        catch { case t: Throwable => errs.add(t): Unit })
      val t2 = new Thread(() =>
        try PartitionedUpsert.merge(spark, dir, changes(100L, kUp, 111L),
          "k", "lsn", "op", Seq("v"), 4): Unit
        catch { case t: Throwable => errs.add(t): Unit })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty,
        s"round $round: disjoint racers must both land, got " +
          errs.toArray.mkString("; "))
      val st = state(dir)
      assert(!st.contains(kDel), s"round $round: delete landed")
      assert(st(kUp) == 111L, s"round $round: merge landed")
    }
  }

  test("mergeWith still resolves a same-txn race as a replay no-op " +
      "(the rebase path must not break the exactly-once fast path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase_txn").toString
    initTable(dir)
    val k1 = (1L to 40L).find(k => bucketOf(k) == 0L).get
    // racer A commits (app, 5); racer B prepared the SAME txn from the
    // same base — its commit must rethrow into mergeWith's replay check
    PartitionedUpsert.merge(spark, dir, changes(100L, k1, 111L),
      "k", "lsn", "op", Seq("v"), 4, txn = Some("app" -> 5L)): Unit
    val touched = PartitionedUpsert.merge(spark, dir,
      changes(100L, k1, 999L), "k", "lsn", "op", Seq("v"), 4,
      txn = Some("app" -> 5L))
    assert(touched.isEmpty, "replayed txn is a metadata no-op")
    assert(state(dir)(k1) == 111L)
  }

  test("MAINTENANCE auto-rebase (r18): an O(table) ZORDER racing a " +
      "merge that only created a NEW bucket — both land; racing a " +
      "merge on a bucket the rewrite touched still errors loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rebase_maint").toString
    // seed keys that AVOID bucket 3, so the zorder target excludes it
    val keys = (1L to 200L).filter(k => bucketOf(k) != 3L).take(30)
    PartitionedUpsert.init(keys.map(k => (k, k * 10L)).toDF("k", "v"),
      dir, "k", 4)
    val prior = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(!prior.buckets.contains(3L), "bucket 3 must start empty")
    // the racer wins: a merge creating bucket 3 (disjoint from every
    // bucket the zorder rewrite read)
    val kNew = (1L to 500L).find(k => bucketOf(k) == 3L).get
    PartitionedUpsert.merge(spark, dir, changes(100L, kNew, 999L),
      "k", "lsn", "op", Seq("v"), 4): Unit
    // the zorder computed from the STALE prior publishes via rebase
    val rewritten = PartitionedUpsert.optimizeZorderFrom(spark, dir,
      prior, Seq("v"), 8)
    assert(rewritten.nonEmpty, "the rewrite must land, not be discarded")
    val st = state(dir)
    assert(st(kNew) == 999L, "the winner's new-bucket merge survives")
    keys.foreach(k => assert(st(k) == k * 10L, s"key $k disturbed"))
    assert(st.size == keys.size + 1)
    // OVERLAP: a racer updating a key in a bucket the rewrite DID
    // touch refuses — merge survives, rewrite leaks nothing
    val prior2 = PartitionedUpsert.manifestOrFail(spark, dir)
    val kOld = keys.head
    PartitionedUpsert.merge(spark, dir, changes(101L, kOld, 111L),
      "k", "lsn", "op", Seq("v"), 4): Unit
    val vAfterMerge = PartitionedUpsert.manifestOrFail(spark, dir).version
    val e = intercept[java.util.ConcurrentModificationException] {
      PartitionedUpsert.optimizeZorderFrom(spark, dir, prior2,
        Seq("v"), 8)
    }
    assert(e.getMessage.contains("also changed bucket"), e.getMessage)
    assert(state(dir)(kOld) == 111L)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version
      == vAfterMerge, "the refused rewrite must not burn a version")
  }
}
