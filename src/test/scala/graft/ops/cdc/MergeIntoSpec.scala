package graft.ops.cdc

import org.apache.spark.sql.functions._
import org.scalatest.exceptions.TestFailedException

import graft.SparkSpec

/** Conditional MERGE semantics: clause-order precedence, the four row
  * classes (update / delete / keep / insert+drop), the
  * duplicate-source error, and the persisted table path agreeing with
  * the pure-frame resolve while touching only source-keyed buckets. */
class MergeIntoSpec extends SparkSpec {

  import MergeInto._

  // target: (k, bal, tag); source: (k, add, n)
  private def tgt = {
    import spark.implicits._
    Seq((1L, 100L, "a"), (2L, -50L, "b"), (3L, 10L, "c"), (4L, 0L, "d"))
      .toDF("k", "bal", "tag")
  }
  private def src = {
    import spark.implicits._
    // k=1 matches both delete (n>=5) and update (bal>0): delete is
    // FIRST in clause order and must win; k=2 matched, fails both
    // conds -> keep; k=3 matched update; k=9 unmatched, add>=100 ->
    // insert; k=10 unmatched, add<100 -> drop
    Seq((1L, 7L, 5L), (2L, 20L, 1L), (3L, 5L, 1L), (9L, 100L, 1L),
      (10L, 99L, 1L)).toDF("k", "add", "n")
  }
  private def clauses = Vector(
    MatchedDelete(Some(col("s.n") >= 5)),
    MatchedUpdate(Some(col("t.bal") > 0), Map(
      "bal" -> (col("t.bal") + col("s.add")), "tag" -> lit("up"))),
    NotMatchedInsert(Some(col("s.add") >= 100), Map(
      "k" -> col("s.k"), "bal" -> col("s.add"), "tag" -> lit("new"))))

  test("clause order wins: delete-before-update removes a row both " +
      "clauses match; keep / insert / drop / passthrough all behave") {
    val out = resolve(tgt, src, Seq("k"), clauses)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out === Array(
      (2L, -50L, "b"),   // matched, fails both conds -> keep
      (3L, 15L, "up"),   // conditional update
      (4L, 0L, "d"),     // target-only passthrough
      (9L, 100L, "new")  // conditional insert; k=1 deleted, k=10 dropped
    ))
  }

  test("clause order is semantic: swapping delete/update changes the " +
      "outcome for the doubly-matched row") {
    val swapped = Vector(clauses(1), clauses(0), clauses(2))
    val out = resolve(tgt, src, Seq("k"), swapped)
      .filter(col("k") === 1).collect()
    assert(out.length === 1 && out.head.getLong(1) === 107L) // updated, not deleted
  }

  test("an unconditional matched clause shadows everything after it") {
    val shadowed = Vector(
      MatchedUpdate(None, Map("tag" -> lit("all"))),
      MatchedDelete(Some(col("s.n") >= 5)))
    val out = resolve(tgt, src, Seq("k"), shadowed)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    // k=1 would be deleted by clause 2, but clause 1 catches it first
    assert(out.toSeq.contains((1L, "all")))
  }

  test("duplicate source rows MATCHING one target row raise (the Delta " +
      "multi-row match error), not silently double-apply") {
    import spark.implicits._
    val dup = src.union(Seq((3L, 1L, 1L)).toDF("k", "add", "n"))
    val e = intercept[Exception] {
      resolve(tgt, dup, Seq("k"), clauses).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("multiple rows")),
      e.getMessage)
  }

  test("duplicate NOT-MATCHED source keys insert one row each in " +
      "resolve (ANSI), but the keyed-table path rejects ANY dup key") {
    import spark.implicits._
    // key 42 matches no target row; both rows pass the insert cond
    val dupUnmatched = src.union(
      Seq((42L, 150L, 1L), (42L, 160L, 1L)).toDF("k", "add", "n"))
    val out = resolve(tgt, dupUnmatched, Seq("k"), clauses)
    assert(out.filter(col("k") === 42L).count() === 2)
    // the keyed table cannot hold two rows for one key -> strict guard
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_dup").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    val e = intercept[Exception] {
      mergeIntoTable(spark, dir, dupUnmatched, "k", clauses, lsn = 1L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("multiple rows")))
  }

  test("an update clause that SETs the table key is rejected by the " +
      "table path (would leave the old-key row alive after rebucketing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_key").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    val keyUpd = Vector(MatchedUpdate(None, Map("k" -> lit(99L))))
    assert(intercept[IllegalArgumentException] {
      mergeIntoTable(spark, dir, src, "k", keyUpd, lsn = 1L)
    }.getMessage.contains("must not change the table key"))
  }

  test("NULL-keyed source rows are exempt from the dup guard and " +
      "route to the NOT MATCHED clauses (ANSI), not an error") {
    import spark.implicits._
    val withNulls = src.union(
      Seq((Option.empty[Long], 150L, 1L), (Option.empty[Long], 120L, 1L))
        .toDF("k", "add", "n"))
    // two null-key rows: no dup error; both hit the insert clause
    // (add >= 100), contributing rows with null keys to the RESOLVED
    // frame (a keyed TABLE path would reject via the key requirement)
    val out = resolve(tgt, withNulls, Seq("k"), clauses)
    assert(out.filter(col("k").isNull).count() === 2)
    assert(out.filter(col("k").isNotNull).count() === 4)
  }

  test("a typo'd SET or VALUES column fails at plan time instead of " +
      "silently no-oping; an insert clause missing the table key is " +
      "rejected by the table path") {
    val bad = Vector(MatchedUpdate(None, Map("balanse" -> lit(1L))))
    val e = intercept[IllegalArgumentException] {
      resolve(tgt, src, Seq("k"), bad)
    }
    assert(e.getMessage.contains("balanse"))
    val badIns = Vector(NotMatchedInsert(None, Map("nope" -> lit(1L))))
    assert(intercept[IllegalArgumentException] {
      resolve(tgt, src, Seq("k"), badIns)
    }.getMessage.contains("nope"))
    // table path: insert VALUES must set the key column
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_k").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 4)
    val noKey = Vector(NotMatchedInsert(None, Map("bal" -> lit(1L))))
    assert(intercept[IllegalArgumentException] {
      mergeIntoTable(spark, dir, src, "k", noKey, lsn = 1L)
    }.getMessage.contains("table key"))
  }

  test("mergeIntoTable: persisted post-state equals resolve(), only " +
      "source-keyed buckets touched, txn replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mi").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 8)
    val touched = mergeIntoTable(spark, dir, src, "k", clauses, lsn = 1L,
      txn = Some(("mi-test", 1L)))
    // bucket bound: at most one bucket per distinct source key
    assert(touched.nonEmpty && touched.size <= 5)
    val expected = resolve(tgt, src, Seq("k"), clauses)
      .orderBy("k").collect().map(_.toString).toSeq
    def state() = PartitionedUpsert.read(spark, dir)
      .select(col("k"), col("bal"), col("tag"))
      .orderBy("k").collect().map(_.toString).toSeq
    assert(state() === expected)
    // replayed txn: metadata no-op, state unchanged
    val replay = mergeIntoTable(spark, dir, src, "k", clauses, lsn = 1L,
      txn = Some(("mi-test", 1L)))
    assert(replay.isEmpty)
    assert(state() === expected)
  }

  test("WHEN NOT MATCHED BY SOURCE: unmatched target rows run their " +
      "own ladder (update/delete/keep) in both resolve and the table " +
      "path; the table path equals resolve") {
    import spark.implicits._
    // target keys 1..4; source hits 1,2 only -> 3,4 are by-source
    val bsSrc = Seq((1L, 7L, 1L), (2L, 20L, 1L)).toDF("k", "add", "n")
    val bsClauses = Vector(
      MatchedUpdate(None, Map("bal" -> (col("t.bal") + col("s.add")))),
      NotMatchedBySourceDelete(Some(col("t.bal") < 0)),   // none match (3:10, 4:0)
      NotMatchedBySourceUpdate(Some(col("t.tag") === "c"), // k=3
        Map("tag" -> lit("stale"))))
    val out = resolve(tgt, bsSrc, Seq("k"), bsClauses)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out === Array(
      (1L, 107L, "a"),   // matched update
      (2L, -30L, "b"),   // matched update
      (3L, 10L, "stale"), // by-source update
      (4L, 0L, "d")))     // by-source: no clause hit -> keep
    // and with a delete that DOES fire: bal < 5 removes k=4 (bal 0)
    val del = Vector(NotMatchedBySourceDelete(Some(col("t.bal") < 5)))
    val out2 = resolve(tgt, bsSrc, Seq("k"), del)
      .orderBy("k").collect().map(_.getLong(0))
    assert(out2 === Array(1L, 2L, 3L)) // k=4 deleted, 3 kept (bal 10)

    // table path: full reconcile equals resolve
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_bs").toString
    PartitionedUpsert.init(tgt, dir, "k", nBuckets = 8)
    mergeIntoTable(spark, dir, bsSrc, "k", bsClauses, lsn = 1L)
    val state = PartitionedUpsert.read(spark, dir)
      .select(col("k"), col("bal"), col("tag"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(state === out)
  }

  test("composite merge keys: resolve joins on ALL key columns — " +
      "a row matching on one key part but not the other is NOT matched") {
    import spark.implicits._
    val t2 = Seq((1L, "x", 10L), (1L, "y", 20L), (2L, "x", 30L))
      .toDF("k1", "k2", "bal")
    val s2 = Seq((1L, "x", 5L), (2L, "y", 7L)).toDF("k1", "k2", "add")
    val out = resolve(t2, s2, Seq("k1", "k2"), Vector(
      MatchedUpdate(None, Map("bal" -> (col("t.bal") + col("s.add")))),
      NotMatchedInsert(None, Map(
        "k1" -> col("s.k1"), "k2" -> col("s.k2"), "bal" -> col("s.add")))))
      .orderBy("k1", "k2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Array(
      (1L, "x", 15L), // matched on (1,x)
      (1L, "y", 20L), // (1,y): k1 matches a source row but k2 differs -> keep
      (2L, "x", 30L), // same
      (2L, "y", 7L))) // source-only composite -> insert
  }

  test("the oracled corpus fixture exercises every clause path at " +
      "sf0.001") {
    val out = qCdcMergeInto(spark, sfSmoke).cache()
    try {
      assert(out.filter(col("seg") === "NEW").count() > 0)
      assert(out.filter(col("seg") === "UPGRADED").count() > 0)
      // keeps: matched rows with non-positive balance survive unchanged
      assert(out.filter(col("bal_cents") <= 0).count() > 0)
    } finally { out.unpersist(); () }
  }
}
