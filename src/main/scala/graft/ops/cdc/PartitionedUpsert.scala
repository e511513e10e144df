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
    * Returns the set of rewritten bucket ids (for observability). */
  def merge(spark: SparkSession, dir: String, changes: DataFrame,
            keyCol: String, lsnCol: String, opCol: String,
            valueCols: Seq[String], nBuckets: Int): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // cache once: each bucket pass below re-filters this, and without
    // the cache every pass would recompute the full upstream lineage
    val withBucket = changes.withColumn("bucket", bucketOf(col(keyCol), nBuckets))
      .persist()
    try {
      val touched = withBucket.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      touched.foreach { b =>
        val bucketDir = s"$dir/bucket=$b"
        val current =
          if (fs.exists(new org.apache.hadoop.fs.Path(bucketDir)))
            spark.read.parquet(bucketDir)
          else {
            val sel = col(keyCol) +: valueCols.map(col)
            changes.select(sel: _*).limit(0)
          }
        val batch = withBucket.filter(col("bucket") === b).drop("bucket")
        val next = Cdc.apply(current, batch, Seq(keyCol), lsnCol, opCol, valueCols)
          .drop("src")
        // write via tmp: the read side of the merge is the write target
        val tmp = s"$dir/.tmp_bucket_$b"
        next.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(bucketDir)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      touched
    } finally withBucket.unpersist()
  }

  /** Read the current state (all buckets). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("bucket")
}
