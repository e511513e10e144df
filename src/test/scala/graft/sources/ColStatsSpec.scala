package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert
import graft.ops.cdc.PartitionedUpsert.Manifest

/** Secondary-column per-bucket min/max pruning (r18, r17 verdict #5):
  * the ZORDER rewrite records per-bucket [min,max] for its integral
  * columns in the manifest, GraftScanBuilder prunes non-key range
  * predicates against them, and every value-changing rewrite of a
  * bucket invalidates its entries — tested pure (the pruner) and
  * end-to-end (fewer buckets read, results unchanged). */
class ColStatsSpec extends SparkSpec {

  private def mkManifest(colStats: Map[Long, Map[String, (Long, Long)]])
      : Manifest =
    Manifest(version = 1L,
      schema = StructType(Seq(StructField("k", LongType),
        StructField("v", LongType), StructField("d", DoubleType))),
      nBuckets = 3, keyCol = "k", txns = Map.empty,
      buckets = Map(0L -> "data/s/bucket=0", 1L -> "data/s/bucket=1",
        2L -> "data/s/bucket=2"),
      colStats = colStats)

  test("pure pruner: non-key range/equality/IN predicates intersect " +
      "the recorded ranges; missing entries keep; non-integral " +
      "columns contribute nothing") {
    val m = mkManifest(Map(
      0L -> Map("v" -> (0L, 99L)),
      1L -> Map("v" -> (100L, 199L))
      // bucket 2: no entry — must always be kept
    ))
    def prune(f: sources.Filter*): Option[Seq[Long]] =
      GraftScanBuilder.pruneBuckets(m, f.toSeq, _ => Seq.empty)
    assert(prune(sources.LessThan("v", 100L)) == Some(Seq(0L, 2L)))
    assert(prune(sources.GreaterThanOrEqual("v", 100L)) == Some(Seq(1L, 2L)))
    assert(prune(sources.EqualTo("v", 150L)) == Some(Seq(1L, 2L)))
    assert(prune(sources.In("v", Array(5L, 7L))) == Some(Seq(0L, 2L)))
    // a value in NO recorded range keeps only the entry-less bucket
    assert(prune(sources.EqualTo("v", 500L)) == Some(Seq(2L)))
    // conjuncts intersect
    assert(prune(sources.GreaterThan("v", 50L),
      sources.LessThan("v", 60L)) == Some(Seq(0L, 2L)))
    // a DOUBLE column never prunes (long-cast truncation could drop a
    // matching bucket — the soundness gate)
    assert(prune(sources.LessThan("d", 1.0)).isEmpty)
    // an IN with an un-longable value contributes nothing
    assert(prune(sources.In("v", Array[Any](5L, "x"))).isEmpty)
  }

  test("end-to-end: ZORDER records the ranges, a non-key range " +
      "predicate reads FEWER buckets through the DSv2 scan, and the " +
      "filtered result equals the unpruned read (range layout makes " +
      "the non-key column bucket-correlated)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colstats").toString + "/t"
    // range layout on k, v = 10*k: buckets hold key ranges, so v
    // ranges are tight per bucket — the layout where inter-file
    // skipping on a non-key column has something to skip
    PartitionedUpsert.init(
      (1L to 100L).map(k => (k, k * 10L)).toDF("k", "v"),
      dir, "k", 4, layout = PartitionedUpsert.LayoutRange)
    PartitionedUpsert.optimizeZorder(spark, dir, Seq("v")): Unit
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    assert(m.colStats.nonEmpty, "zorder must record the ranges")
    assert(m.colStats.values.forall(_.contains("v")))
    // the scan advertises its bucket pruning in its description
    // (buckets=<kept>/<total>): drive the ScanBuilder exactly as
    // Spark's pushdown does (the V1Scan-delegated physical plan
    // renders an anonymous relation, so the description is read from
    // the built Scan itself)
    def keptBuckets(filters: sources.Filter*): (Int, Int) = {
      val sb = new GraftScanBuilder(dir,
        PartitionedUpsert.manifestOrFail(spark, dir))
      sb.pushFilters(filters.toArray): Unit
      val re = """buckets=(\d+)/(\d+)""".r
      val desc = sb.build().description()
      re.findFirstMatchIn(desc)
        .map(x => (x.group(1).toInt, x.group(2).toInt))
        .getOrElse(fail(s"no buckets=k/n marker in: $desc"))
    }
    assert(keptBuckets() == (4, 4))
    val (kept, total) = keptBuckets(sources.LessThanOrEqual("v", 200L))
    assert(kept < total, s"expected fewer than $total buckets, got $kept")
    val pruned = spark.read.format("graft").load(dir).filter($"v" <= 200L)
    // results unchanged by pruning (the oracle-hashes-unchanged check)
    val expect = (1L to 20L).map(k => (k, k * 10L)).toSet
    assert(pruned.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
  }

  test("invalidation: a merge touching a bucket drops ITS entries " +
      "only; the pruned read stays correct (conservative keep)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colstats_inv").toString + "/t"
    PartitionedUpsert.init(
      (1L to 100L).map(k => (k, k * 10L)).toDF("k", "v"),
      dir, "k", 4, layout = PartitionedUpsert.LayoutRange)
    PartitionedUpsert.optimizeZorder(spark, dir, Seq("v")): Unit
    val before = PartitionedUpsert.manifestOrFail(spark, dir).colStats
    assert(before.size == 4)
    // merge a key in the LAST bucket with a v far OUTSIDE its
    // recorded range — the entry must drop, or pruning would lose it
    PartitionedUpsert.merge(spark, dir,
      Seq(("u", 9L, 99L, 5L)).toDF("__op", "__lsn", "k", "v"),
      "k", "__lsn", "__op", Seq("v"), 4): Unit
    val m = PartitionedUpsert.manifestOrFail(spark, dir)
    val touchedBucket = 3L // k=99 in the top key range of 4 splits
    assert(!m.colStats.contains(touchedBucket),
      s"touched bucket's entries must drop, got ${m.colStats.keySet}")
    assert(m.colStats.size == 3, "untouched buckets keep theirs")
    // the out-of-range row IS found by a predicate its bucket's OLD
    // range would have pruned
    val got = spark.read.format("graft").load(dir).filter($"v" <= 5L)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((99L, 5L)))
    // COMPACTION refreshes the dropped entry (r18): a WIDE merge into
    // the top bucket (keys above the last range split all route
    // there) spreads its rewrite across shuffle partitions —
    // fragmenting the bucket — then OPTIMIZE re-records the declared
    // column with the merged rows' NEW range, keeping them findable
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // AQE coalesces this tiny rewrite to one partition = one file;
      // real merges at scale write a bucket from many tasks — force
      // that shape so the bucket actually fragments
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      PartitionedUpsert.merge(spark, dir,
        (200L to 219L).map(k => ("u", 10L + k, k, 4L))
          .toDF("__op", "__lsn", "k", "v").repartition(4),
        "k", "__lsn", "__op", Seq("v"), 4): Unit
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val compacted = PartitionedUpsert.compactFiles(spark, dir,
      maxFilesPerBucket = 1)
    assert(compacted.contains(touchedBucket), s"got $compacted")
    val m2 = PartitionedUpsert.manifestOrFail(spark, dir)
    val entry = m2.colStats.get(touchedBucket).flatMap(_.get("v"))
    assert(entry.nonEmpty, "OPTIMIZE must re-record the declared column")
    assert(entry.get._1 <= 4L, s"refreshed range must cover the 4s: $entry")
    assert(spark.read.format("graft").load(dir).filter($"v" <= 5L)
      .count() == 21L) // the k=99 row + the 20 merged ones
  }
}
