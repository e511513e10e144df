package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KllQuantiles, KllSketchAgg}

/** Incrementally maintained PER-GROUP quantile profiles — the
  * distribution sibling of the maintained-aggregate family:
  * [[AggMaintain]] keeps sums/counts, [[MinMaxMaintain]] the extremes,
  * [[StatsMaintain]] a whole-table profile; this keeps one mergeable
  * KLL sketch PER GROUP fresh from the CDF, so per-tenant /
  * per-language percentile dashboards read a bucket-pruned table
  * instead of re-scanning their partitions.
  *
  * The delta contract is the KLL one (StatsMaintain's quantile rule,
  * applied per group): sketches UNION exactly — an insert window
  * folds in as `merge(stored, window)` — but cannot subtract, so
  * deletes and value-changing updates accumulate in a per-group
  * `stale` counter; the estimate keeps reflecting every insert ever
  * seen, and `stale/n` is the per-group refresh signal ([[refresh]]
  * rebuilds only the groups the caller picks — the scoped-rescan
  * shape, caller-scheduled because how much staleness is tolerable is
  * a judgement only the dashboard's owner can make).
  *
  * All machinery lives in [[SketchMaintain]] (shared with
  * [[FreqMaintain]] — any mergeable, non-subtractable sketch
  * maintains identically); this binds the KLL hooks. */
object QuantileMaintain {

  private def hooks(k: Int) = SketchMaintain.Hooks(
    register = KllSketchAgg.register,
    agg = c => KllSketchAgg.kll_agg(c, k),
    merge = KllQuantiles.merge)

  def init(spark: SparkSession, sourceDir: String, qDir: String,
           groupCols: Seq[String], valueCol: String, k: Int,
           nBuckets: Int): Long =
    SketchMaintain.init(hooks(k), spark, sourceDir, qDir, groupCols,
      valueCol, nBuckets)

  /** Advance the profile over the CDF window (cursor, current]. Insert
    * images union into the touched groups' sketches; deletes and
    * value-changing updates bump `stale`. Same txn/no-op/retry
    * contract as the sibling maintainers. */
  def maintain(spark: SparkSession, sourceDir: String, qDir: String,
               valueCol: String, k: Int,
               toVersion: Option[Long] = None): (Long, Long) =
    SketchMaintain.maintain(hooks(k), spark, sourceDir, qDir, valueCol,
      toVersion)

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules.
    * Pass the groups a dashboard's tolerance flags; their sketches
    * rebuild from the live rows (stale resets), others stay. */
  def refresh(spark: SparkSession, sourceDir: String, qDir: String,
              groups: DataFrame, valueCol: String, k: Int): Long =
    SketchMaintain.refresh(hooks(k), spark, sourceDir, qDir, groups,
      valueCol)

  /** The maintained profile with derived quantile columns at `ranks`
    * (driver-free: per-row UDF over the blob). */
  def read(spark: SparkSession, qDir: String,
           ranks: Seq[Double]): DataFrame = {
    val quantsUdf = udf { (blob: Array[Byte]) =>
      if (blob == null) null else KllQuantiles.quantiles(blob, ranks)
    }
    PartitionedUpsert.read(spark, qDir).drop("gkey")
      .withColumn("quantiles", quantsUdf(col("sketch")))
  }
}
