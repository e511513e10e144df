package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned merge-by-rewrite upsert target (§2-A upsert
  * sink, the 100 TB version).
  *
  * No Delta/Iceberg jar ships in the container, so the sink is plain
  * parquet; the naive foreachBatch merge rewrites the whole table per
  * batch, which is O(table) — unusable at scale. This target hash-
  * partitions the table into `nBuckets` by key (hive-style
  * `bucket=<i>` directories) and a merge:
  *   1. computes the bucket of every change key,
  *   2. reads ONLY those bucket directories,
  *   3. applies the log (Cdc.apply), and
  *   4. rewrites only those buckets.
  * Per-batch cost is O(touched buckets), i.e. proportional to change
  * volume, not table size — the same partition-pruned-merge shape
  * Delta's MERGE performs, built from public parquet + pruning
  * primitives.
  */
object PartitionedUpsert {

  def bucketOf(keyCol: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(keyCol), lit(nBuckets))

  /** Initialize the target from a snapshot. */
  def init(snapshot: DataFrame, dir: String, keyCol: String, nBuckets: Int): Unit =
    snapshot
      .withColumn("bucket", bucketOf(col(keyCol), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  /** Merge a change batch, rewriting only the buckets its keys touch.
    * Returns the set of rewritten bucket ids (for observability).
    *
    * Single-job shape: one partition-pruned read of the touched bucket
    * directories, one `Cdc.apply`, one dynamic-partition-overwrite
    * write. Cost is O(touched buckets) in data AND O(1) in Spark jobs —
    * at 100 TB with thousands of touched buckets the driver never
    * becomes a per-bucket scheduling bottleneck (the previous design
    * looped 3 jobs per bucket).
    *
    * `localCheckpoint` materializes the merged state before the write:
    * it severs the plan's lineage to the target files, so the overwrite
    * neither trips Spark's read-write-conflict check nor recomputes
    * from partitions it is deleting. The materialized set is bounded by
    * the touched buckets (change-volume scale, not table scale). */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
            keyCol: String, lsnCol: String, opCol: String,
            valueCols: Seq[String], nBuckets: Int): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBucket = changes.withColumn("bucket", bucketOf(col(keyCol), nBuckets))
      .persist()
    try {
      // small by construction: ≤ nBuckets longs
      val touched = withBucket.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      val current = spark.read.parquet(dir)
        .filter(col("bucket").isin(touched: _*)) // partition-pruned scan
        .drop("bucket")
      val next = Cdc.apply(current, withBucket.drop("bucket"),
          Seq(keyCol), lsnCol, opCol, valueCols)
        .drop("src")
        .withColumn("bucket", bucketOf(col(keyCol), nBuckets))
        .localCheckpoint()
      next.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(dir)
      // dynamic overwrite rewrites only partitions PRESENT in `next`; a
      // touched bucket whose keys were all deleted is absent from the
      // output and its stale directory must be dropped explicitly
      val written = next.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      touched.filterNot(written).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/bucket=$b"), true): Unit
      }
      touched
    } finally withBucket.unpersist()
  }

  /** Read the current state (all buckets). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("bucket")
}
