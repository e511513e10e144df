package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The secondary-column Bloom sidecar: lookups must equal a full-scan
  * filter in every staleness state (fresh, stale-with-diff, no index),
  * pruning must actually engage (a rare value reads ~1 bucket, not
  * 16), refresh must rebuild only the buckets the manifest diff names,
  * and an incomplete (crashed) publish must be invisible. */
class BloomIndexSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (s"$base/table", s"$base/idx")
  }

  /** 400 rows keyed by id over 16 hash buckets; user u{id%40} except
    * one planted rare user on a single row. */
  private def seed(tableDir: String): Unit = {
    import spark.implicits._
    val rows = (0L until 400L).map(i =>
      (i, if (i == 137L) "rare_user" else s"u${i % 40}", i * 10))
      .toDF("id", "user", "cents")
    PartitionedUpsert.init(rows, tableDir, "id", 16)
  }

  private def scanEq(tableDir: String, idxDir: String,
                     values: Seq[Any]): Unit = {
    val viaIdx = BloomIndex
      .lookup(spark, tableDir, idxDir, "user", values)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = PartitionedUpsert.read(spark, tableDir)
      .filter(col("user").isin(values: _*))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaIdx == full)
  }

  test("fresh index: lookup equals scan, a rare value prunes to ~1 of " +
      "16 buckets, an absent value to ~0") {
    val (tableDir, idxDir) = freshDirs()
    seed(tableDir)
    val v = BloomIndex.build(spark, tableDir, idxDir, "user")
    assert(BloomIndex.indexedVersion(spark, idxDir).contains(v))
    scanEq(tableDir, idxDir, Seq("rare_user"))
    scanEq(tableDir, idxDir, Seq("u3", "u17"))
    // deterministic data + deterministic hashing: bounds are exact
    // reruns, not probabilistic hopes. fpp 0.01 over 16 buckets makes
    // a false-positive bucket unlikely but legal — allow ≤ 2.
    val rare = BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "user", Seq("rare_user"))
    assert(rare.nonEmpty && rare.size <= 2,
      s"rare_user should read ~1 bucket, got ${rare.size}")
    val absent = BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "user", Seq("nobody_here"))
    assert(absent.size <= 2, s"absent value hit ${absent.size} buckets")
    assert(BloomIndex.lookup(
      spark, tableDir, idxDir, "user", Seq("nobody_here")).count() == 0)
  }

  test("stale index stays correct via manifest-diff inclusion; refresh " +
      "rebuilds only changed buckets and re-prunes the new value") {
    import spark.implicits._
    val (tableDir, idxDir) = freshDirs()
    seed(tableDir)
    BloomIndex.build(spark, tableDir, idxDir, "user")
    // merge touches exactly the buckets of keys 1000,1001: new rare user
    val changed = PartitionedUpsert.merge(spark, tableDir,
      Seq((1L, 1000L, "i", "fresh_user", 1L), (2L, 1001L, "i", "fresh_user", 2L))
        .toDF("lsn", "id", "op", "user", "cents"),
      "id", "lsn", "op", Seq("user", "cents"), 16)
    assert(changed.nonEmpty)
    // stale: fresh_user predates no bloom, but its buckets are in the
    // manifest diff → conservatively included → correct rows
    scanEq(tableDir, idxDir, Seq("fresh_user"))
    scanEq(tableDir, idxDir, Seq("rare_user"))
    val staleCand = BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "user", Seq("fresh_user"))
    assert(staleCand.nonEmpty && staleCand.size <= 4,
      "stale lookup should read only diff buckets (+ possible fp), " +
        s"got ${staleCand.size}")
    val (rebuilt, reused) = BloomIndex.refresh(spark, tableDir, idxDir)
    assert(rebuilt >= 1 && rebuilt <= 2, s"rebuilt $rebuilt buckets")
    assert(rebuilt + reused == 16)
    scanEq(tableDir, idxDir, Seq("fresh_user"))
    val freshCand = BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "user", Seq("fresh_user"))
    assert(freshCand.nonEmpty && freshCand.size <= 3)
    // idempotent: a second refresh is a no-op reusing everything
    assert(BloomIndex.refresh(spark, tableDir, idxDir) == ((0, 16)))
  }

  test("a crashed publish (no _DONE) is invisible; numeric secondary " +
      "columns probe through the same engine hash") {
    import spark.implicits._
    val (tableDir, idxDir) = freshDirs()
    seed(tableDir)
    // fake a torn write: version dir exists, no _DONE
    val torn = new java.io.File(s"$idxDir/v${"%020d".format(1L)}")
    torn.mkdirs()
    assert(BloomIndex.indexedVersion(spark, idxDir).isEmpty)
    // without an index every bucket is a candidate — correct, not fast
    assert(BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "user", Seq("rare_user")).size == 16)
    scanEq(tableDir, idxDir, Seq("rare_user"))
    // numeric column: cents = 1370 exists only on id=137's row
    BloomIndex.build(spark, tableDir, idxDir, "cents")
    val cand = BloomIndex.candidateBuckets(
      spark, tableDir, idxDir, "cents", Seq(1370L))
    assert(cand.nonEmpty && cand.size <= 2, s"got ${cand.size}")
    val hit = BloomIndex.lookup(
      spark, tableDir, idxDir, "cents", Seq(1370L)).collect()
    assert(hit.map(_.getAs[Long]("id")).toSeq == Seq(137L))
    // probing the wrong column is rejected loudly
    intercept[IllegalArgumentException] {
      BloomIndex.candidateBuckets(
        spark, tableDir, idxDir, "user", Seq("rare_user"))
    }
  }
}
