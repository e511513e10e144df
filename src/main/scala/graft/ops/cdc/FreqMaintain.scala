package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FreqSketchAgg

/** Incrementally maintained PER-GROUP heavy-hitter profiles — the
  * frequent-items member of the maintained-distribution family
  * ([[QuantileMaintain]] keeps the value DISTRIBUTION per group; this
  * keeps the top ITEMS per group): one mergeable frequent-items
  * sketch per group, fresh from the CDF — "top referrers per tenant"
  * / "top SKUs per region" dashboards without re-scanning partitions.
  *
  * Why the blob and not Spark's `approx_top_k`: the resolved top-k is
  * a RESULT, not a state — it cannot absorb the next window. The
  * maintained profile needs the mergeable sketch blob so a window's
  * sketch unions into the stored one (frequent-items merge is
  * associative and the Misra-Gries error bound survives union —
  * FreqSketchAgg's contract).
  *
  * Same staleness algebra as every non-subtractable sketch
  * ([[SketchMaintain]] scaladoc): inserts union in exactly; deletes /
  * item-changes / group-moves bump `stale`; `stale/n` schedules the
  * scoped [[refresh]]. NO_FALSE_NEGATIVES read rule: an item above
  * the error band is never missing from the sketch, so a maintained
  * hitter can only be displaced by staleness the counter makes
  * visible. */
object FreqMaintain {

  private def hooks(maxMapSize: Int) = SketchMaintain.Hooks(
    register = FreqSketchAgg.register,
    agg = c => FreqSketchAgg.freq_agg(c, maxMapSize),
    merge = FreqSketchAgg.merge)

  def init(spark: SparkSession, sourceDir: String, fDir: String,
           groupCols: Seq[String], itemCol: String, maxMapSize: Int,
           nBuckets: Int): Long =
    SketchMaintain.init(hooks(maxMapSize), spark, sourceDir, fDir,
      groupCols, itemCol, nBuckets)

  /** Advance the profile over the CDF window (cursor, current]. Same
    * txn/no-op/retry contract as the sibling maintainers. */
  def maintain(spark: SparkSession, sourceDir: String, fDir: String,
               itemCol: String, maxMapSize: Int,
               toVersion: Option[Long] = None): (Long, Long) =
    SketchMaintain.maintain(hooks(maxMapSize), spark, sourceDir, fDir,
      itemCol, toVersion)

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules. */
  def refresh(spark: SparkSession, sourceDir: String, fDir: String,
              groups: DataFrame, itemCol: String,
              maxMapSize: Int): Long =
    SketchMaintain.refresh(hooks(maxMapSize), spark, sourceDir, fDir,
      groups, itemCol)

  /** The maintained profile with the per-group top-k derived as an
    * array of (item, estimate, lower, upper) structs — driver-free
    * (per-row UDF over the blob), NO_FALSE_NEGATIVES semantics. */
  def read(spark: SparkSession, fDir: String, k: Int): DataFrame = {
    val topUdf = udf { (blob: Array[Byte]) =>
      if (blob == null) null else FreqSketchAgg.topK(blob, k)
    }
    PartitionedUpsert.read(spark, fDir).drop("gkey")
      .withColumn("top_items", topUdf(col("sketch")))
  }
}
