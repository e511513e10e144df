package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: multi-dimensional pruning must actually engage —
  * a box predicate touching BOTH dims reads ~1 file, a one-dim box on
  * the SECOND dim (where linear clustering is blind) reads a fraction
  * of the files while the linear layout reads all of them — and the
  * documented trade-off (linear beats z on its own sort column) must
  * hold, with byte-identical data round-tripping either way. */
class ZOrderLayoutSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_zorder").toString

  test("z-order prunes on both dimensions; linear only on its sort key; " +
      "data round-trips") {
    import spark.implicits._
    // deterministic 100x100 grid, one row per cell
    val df = (0 until 10000).map(i => (i / 100, i % 100, i.toLong))
      .toDF("a", "b", "payload")
    val base = freshDir()
    val zdir = s"$base/z"
    val ldir = s"$base/linear"
    ZOrderLayout.write(df, zdir, "a", "b", numFiles = 16, bits = 4)
    df.repartitionByRange(16, col("a"))
      .sortWithinPartitions("a")
      .write.mode("overwrite").parquet(ldir)
    assert(ZOrderLayout.fileCount(spark, zdir) == 16)
    assert(ZOrderLayout.fileCount(spark, ldir) == 16)

    // round-trip equality (layout is placement only)
    val got = spark.read.parquet(zdir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == (0 until 10000).map(i => (i / 100, i % 100, i.toLong)))

    def files(dir: String, loA: Long, hiA: Long, loB: Long, hiB: Long) =
      ZOrderLayout.filesForBox(spark, dir, "a", loA, hiA, "b", loB, hiB)
        .size

    // both-dims box (one quadrant cell): z reads ~1 file of 16
    assert(files(zdir, 10, 15, 10, 15) <= 3,
      s"tight box read ${files(zdir, 10, 15, 10, 15)} z files")
    // second-dim-only box: linear clustering is blind (every file
    // spans all of b) — z prunes to its b-quarter
    val zB = files(zdir, 0, 99, 10, 15)
    val lB = files(ldir, 0, 99, 10, 15)
    assert(lB == 16, s"linear layout should read all 16 files, got $lB")
    assert(zB <= 8, s"z layout read $zB of 16 files on a b-only box")
    // the documented trade-off: on the linear sort key itself, linear
    // is at least as selective as z
    val zA = files(zdir, 10, 15, 0, 99)
    val lA = files(ldir, 10, 15, 0, 99)
    assert(lA <= zA,
      s"linear ($lA files) should beat z ($zA files) on its own key")
    assert(zA <= 8, s"a-only box read $zA of 16 z files")
  }

  test("skewed data degrades clustering, never correctness: quantile " +
      "codes absorb the skew and reads still filter exactly") {
    import spark.implicits._
    // 90% of mass at a=0..9, long tail to 9999
    val rows = (0 until 9000).map(i => (i % 10, i % 100, i.toLong)) ++
      (0 until 1000).map(i => (10 + i * 9, i % 100, (9000 + i).toLong))
    val df = rows.toDF("a", "b", "payload")
    val dir = s"${freshDir()}/zskew"
    ZOrderLayout.write(df, dir, "a", "b", numFiles = 8, bits = 4)
    val back = spark.read.parquet(dir)
      .filter(col("a") === 3 && col("b") === 7)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val expect = rows.filter(r => r._1 == 3 && r._2 == 7)
    assert(back.sorted == expect.sorted)
    // quantile splits put the hot head into its own code buckets: a
    // hot-head box still prunes (not all files), exact count left open
    val hot = ZOrderLayout.filesForBox(spark, dir, "a", 0, 3, "b", 0, 24)
    assert(hot.size < 8, s"hot box read all ${hot.size} files")
  }
}
