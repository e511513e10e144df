package graft.ops.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** `OPTIMIZE t ZORDER BY (…)` — intra-bucket z-order re-cluster:
  * bucket placement (key routing) untouched, rows within each bucket
  * file sorted by the Morton code so parquet row-group stats tighten
  * on the z-dimensions. */
class ZorderOptimizeSpec extends SparkSpec {

  private def fixture(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_zorder_$tag").toString
    // v deliberately anti-correlated with insertion order so a
    // pre-optimize file is NOT already sorted by v
    PartitionedUpsert.init(
      (1L to 200L).map(k => (k, (200L - k) * 7L)).toDF("k", "v"),
      dir, "k", 4)
    dir
  }

  private def rows(dir: String): Seq[(Long, Long)] =
    PartitionedUpsert.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("ZORDER BY (v) via SQL: every bucket rewrites once, contents " +
      "identical, and each bucket file is sorted by v's rank code") {
    val dir = fixture("sort")
    val before = rows(dir)
    val tbl = s"graft_zorder_t_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      val receipt = spark.sql(s"OPTIMIZE $tbl ZORDER BY (v)")
        .head().getLong(0)
      assert(receipt == 4L, "all buckets re-cluster")
      assert(rows(dir) == before, "re-clustering moves rows, never changes them")
      val m = PartitionedUpsert.manifestOrFail(spark, dir)
      assert(m.version == 2L)
      // same data → same deterministic split plan; each bucket file's
      // code sequence must be non-decreasing (sorted within file)
      val splits = graft.sources.ZOrderLayout.planSplits(
        PartitionedUpsert.read(spark, dir), "v", 8)
      PartitionedUpsert.bucketPaths(spark, dir).values.foreach { p =>
        val codes = spark.read.parquet(p)
          .select(graft.sources.ZOrderLayout.rankCode(col("v"), splits))
          .collect().map(_.getLong(0)).toSeq
        assert(codes == codes.sorted, s"bucket file $p is not z-sorted")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("two-column ZORDER composes with merge-on-read debt: " +
      "tombstoned rows stay deleted and the sidecars retire with " +
      "the rewrite; guards reject 3 columns, MAXFILES+ZORDER, and " +
      "unknown columns") {
    import spark.implicits._
    val dir = fixture("mor")
    PartitionedUpsert.deleteMor(spark, dir, Seq(5L, 50L).toDF("k"), "k")
    val before = rows(dir)
    val done = PartitionedUpsert.optimizeZorder(spark, dir, Seq("k", "v"))
    assert(done.nonEmpty)
    assert(rows(dir) == before)
    assert(PartitionedUpsert.manifestOrFail(spark, dir).tombs.isEmpty,
      "a full rewrite pays the MOR debt")
    // arity is bounded by z-bits, not a fixed column count (r16 #6):
    // 8 cols × 8 bits = 64 > 63 → loud reject
    val eBits = intercept[IllegalArgumentException] {
      PartitionedUpsert.optimizeZorder(spark, dir,
        Seq.fill(8)("v"), bits = 8)
    }
    assert(eBits.getMessage.contains("exceeds a long"))
    intercept[IllegalArgumentException] {
      PartitionedUpsert.optimizeZorder(spark, dir, Seq("nope"))
    }
    val tbl = s"graft_zorder_g_${math.abs(dir.hashCode)}"
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dir'")
    try {
      val e = intercept[Exception] {
        spark.sql(s"OPTIMIZE $tbl MAXFILES 2 ZORDER BY (v)")
      }
      assert(e.getMessage.contains("not both"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("THREE-column ZORDER (r16 #6): per-file z-codes sorted, 2-col " +
      "Morton layout unchanged (interleave(2) == morton), non-imageable " +
      "columns rejected loudly, strings admitted (r19)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder3").toString
    // three decorrelated dimensions + a string column for the type gate
    val rnd = new scala.util.Random(7)
    PartitionedUpsert.init(
      (1L to 400L).map(k => (k, rnd.nextInt(1000).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        s"s$k", s"s$k".getBytes("UTF-8")))
        .toDF("k", "a", "b", "c", "tag", "bin"),
      dir, "k", 4)
    val before = rows3(dir)
    val done = PartitionedUpsert.optimizeZorder(spark, dir,
      Seq("a", "b", "c"), bits = 6)
    assert(done.size == 4)
    assert(rows3(dir) == before, "re-clustering never changes contents")
    // each bucket file sorted by the 3-way interleaved code
    val cur = PartitionedUpsert.read(spark, dir)
    val splits = graft.sources.ZOrderLayout.planSplitsN(
      cur, Seq("a", "b", "c"), 6)
    val z = graft.sources.ZOrderLayout.interleave(
      Seq("a", "b", "c").zip(splits).map { case (c, s) =>
        graft.sources.ZOrderLayout.rankCode(col(c), s) }, 6)
    PartitionedUpsert.bucketPaths(spark, dir).values.foreach { p =>
      val codes = spark.read.parquet(p).select(z)
        .collect().map(_.getLong(0)).toSeq
      assert(codes == codes.sorted, s"bucket file $p is not z3-sorted")
    }
    // the generalized interleave reproduces the committed 2-col layout
    val eq = spark.range(0, 256).select(
      (graft.sources.ZOrderLayout.morton(col("id") % 16, col("id") / 16, 4)
        === graft.sources.ZOrderLayout.interleave(
          Seq(col("id") % 16, col("id") / 16), 4)).as("same"))
      .agg(org.apache.spark.sql.functions.min(col("same"))).head().getBoolean(0)
    assert(eq, "interleave(Seq(a,b)) must equal morton(a,b) bit-for-bit")
    // type gate: a non-imageable (binary) column fails loudly BEFORE
    // any rewrite — strings are ADMITTED since r19 (8-byte prefix
    // image; StrStatsSpec owns the string end-to-end)
    val v = PartitionedUpsert.manifestOrFail(spark, dir).version
    val eType = intercept[IllegalArgumentException] {
      PartitionedUpsert.optimizeZorder(spark, dir, Seq("a", "bin"))
    }
    assert(eType.getMessage.contains("bin"))
    assert(PartitionedUpsert.manifestOrFail(spark, dir).version == v,
      "rejected ZORDER must not burn a version or rewrite anything")
    // the r19 admission: a STRING zorder column clusters and records
    // truncated bounds instead of being refused
    PartitionedUpsert.optimizeZorder(spark, dir, Seq("tag")): Unit
    assert(PartitionedUpsert.manifestOrFail(spark, dir)
      .strStats.values.forall(_.contains("tag")))
  }

  private def rows3(dir: String): Seq[(Long, Long, Long, Long, String)] =
    PartitionedUpsert.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
}
