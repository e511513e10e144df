package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incrementally maintained table statistics: exact where the delta
  * algebra composes (rows, nulls, insert-only min/max), honestly
  * flagged where it cannot (boundary removal, NDV under deletes), and
  * restored by refresh. */
class StatsMaintainSpec extends SparkSpec {

  private def freshDirs(tag: String): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_stats$tag").toString
    (s"$base/t", s"$base/stats")
  }

  private def directRows(tDir: String): Long =
    PartitionedUpsert.read(spark, tDir).count()

  private def exactNdv(tDir: String, c: String): Long =
    PartitionedUpsert.read(spark, tDir).select(c).na.drop().distinct().count()

  test("init profiles exactly; insert window maintains rows/nulls/bounds " +
      "exactly and NDV within the sketch band; replay is a no-op") {
    import spark.implicits._
    val (tDir, sDir) = freshDirs("a")
    val snap = (0L until 500L)
      .map(i => (i, i * 3, if (i % 10 == 0) null else s"u${i % 37}"))
      .toDF("pk", "amount", "tag")
    PartitionedUpsert.init(snap, tDir, "pk", nBuckets = 8)
    val t1 = StatsMaintain.init(spark, tDir, sDir, Seq("pk", "amount", "tag"))
    assert(t1.rows === 500L)
    assert(t1.cols("tag").nulls === 50L)
    assert(t1.cols("amount").min.contains(0L) &&
      t1.cols("amount").max.contains(1497L) && t1.cols("amount").minmaxExact)
    assert(t1.cols("tag").min.isEmpty, "string columns carry no min/max")
    val ndv1 = t1.ndvEstimate(spark, "tag").get
    assert(math.abs(ndv1 - 37.0) / 37.0 < 0.05, s"ndv $ndv1 vs exact 37")

    // insert-only window: everything stays exact
    PartitionedUpsert.merge(spark, tDir,
      (500L until 600L).map(i => (i, i, "c", i * 3, s"new${i % 5}"))
        .toDF("lsn", "pk", "op", "amount", "tag"),
      "pk", "lsn", "op", Seq("amount", "tag"), 8)
    val t2 = StatsMaintain.maintain(spark, tDir, sDir)
    assert(t2.rows === directRows(tDir) && t2.rows === 600L)
    assert(t2.cols("tag").nulls === 50L)
    assert(t2.cols("amount").max.contains(1797L) && t2.cols("amount").minmaxExact)
    assert(t2.cols("tag").staleDeletes === 0L)
    val ndv2 = t2.ndvEstimate(spark, "tag").get
    val exact2 = exactNdv(tDir, "tag")
    assert(math.abs(ndv2 - exact2) / exact2 < 0.05, s"ndv $ndv2 vs $exact2")

    // replayed step: cursor already current -> same profile version,
    // zero new stats versions
    val t3 = StatsMaintain.maintain(spark, tDir, sDir)
    assert(t3.version === t2.version && t3.cursor === t2.cursor)

    // quantile profile (KLL): estimates inside the published rank-error
    // band against the exact percentiles, BOTH at init and after the
    // insert-window union (amount = pk*3 over 0..499 then pk over
    // 500..599 — exact quantiles computable in closed form via sort)
    val exactQ = PartitionedUpsert.read(spark, tDir)
      .stat.approxQuantile("amount", Array(0.25, 0.5, 0.75), 0.0)
    val est = t2.quantileEstimate("amount", Seq(0.25, 0.5, 0.75)).get
    est.zip(exactQ).foreach { case (e, x) =>
      // 1.65% rank error on 600 values ~ +-10 ranks ~ +-30 in value
      // (step 3); allow 2x the bound for the two-sided estimate
      assert(math.abs(e - x) <= 60.0, s"quantile est $e vs exact $x")
    }
    // the rank estimate prices a <= predicate: amount <= 750 covers
    // half of the first block (251 rows) + 26 of the second window
    val sel = t2.rankEstimate("amount", 750.0).get
    val trueSel = PartitionedUpsert.read(spark, tDir)
      .filter($"amount" <= 750).count().toDouble / t2.rows
    assert(math.abs(sel - trueSel) < 0.04,
      s"selectivity est $sel vs true $trueSel")
    assert(t2.cols("tag").quant.isEmpty, "no quantile sketch for strings")
  }

  test("deleting a boundary row keeps a COVERING bound but drops the " +
      "exactness flag; NDV staleness counts; refresh restores exactness") {
    import spark.implicits._
    val (tDir, sDir) = freshDirs("b")
    val snap = (0L until 200L).map(i => (i, i * 5, s"v${i % 20}"))
      .toDF("pk", "amount", "tag")
    PartitionedUpsert.init(snap, tDir, "pk", nBuckets = 4)
    StatsMaintain.init(spark, tDir, sDir, Seq("amount", "tag"))
    // delete the max-amount row and retag another (a value-changing
    // update) — min/max can no longer be derived from deltas, NDV can
    // only be an upper bound
    PartitionedUpsert.merge(spark, tDir,
      Seq((1000L, 199L, "d", 0L, ""), (1001L, 0L, "u", 0L, "retagged"))
        .toDF("lsn", "pk", "op", "amount", "tag"),
      "pk", "lsn", "op", Seq("amount", "tag"), 4)
    val t2 = StatsMaintain.maintain(spark, tDir, sDir)
    assert(t2.rows === 199L)
    val trueMax = PartitionedUpsert.read(spark, tDir)
      .agg(max($"amount")).head().getLong(0)
    assert(t2.cols("amount").max.get >= trueMax, "bound must stay covering")
    assert(!t2.cols("amount").minmaxExact, "boundary removal must be flagged")
    assert(t2.cols("tag").staleDeletes === 2L,
      "one delete + one value-changing update")
    val upper = t2.ndvEstimate(spark, "tag").get
    assert(upper >= exactNdv(tDir, "tag") * 0.95,
      "stale NDV must remain a (near-)upper bound")
    // refresh: O(table) escape hatch resets flags and re-tightens
    val t3 = StatsMaintain.refresh(spark, tDir, sDir)
    assert(t3.cols("amount").max.contains(trueMax) && t3.cols("amount").minmaxExact)
    assert(t3.cols("tag").staleDeletes === 0L)
    assert(t3.version === t2.version + 1 && t3.cursor === t2.cursor)
  }

  test("non-boundary updates/deletes keep min/max exact; a foreign " +
      "stats dir and an uninitialized read fail loudly") {
    import spark.implicits._
    val (tDir, sDir) = freshDirs("c")
    val snap = (0L until 100L).map(i => (i, i + 50)).toDF("pk", "amount")
    PartitionedUpsert.init(snap, tDir, "pk", nBuckets = 4)
    StatsMaintain.init(spark, tDir, sDir, Seq("amount"))
    PartitionedUpsert.merge(spark, tDir,
      Seq((10L, 50L, "u", 75L), (11L, 51L, "d", 0L))
        .toDF("lsn", "pk", "op", "amount"),
      "pk", "lsn", "op", Seq("amount"), 4)
    val t2 = StatsMaintain.maintain(spark, tDir, sDir)
    assert(t2.cols("amount").minmaxExact,
      "interior changes must not poison the bounds")
    assert(t2.cols("amount").min.contains(50L) &&
      t2.cols("amount").max.contains(149L))
    intercept[IllegalStateException] {
      StatsMaintain.maintain(spark, tDir, s"$sDir-nowhere")
    }
    // a stats profile pinned ahead of its table (wrong table) rejects
    val (tDir2, _) = freshDirs("c2")
    PartitionedUpsert.init(snap.limit(5), tDir2, "pk", nBuckets = 2)
    intercept[IllegalArgumentException] {
      StatsMaintain.maintain(spark, tDir2, sDir)
    }
  }
}
