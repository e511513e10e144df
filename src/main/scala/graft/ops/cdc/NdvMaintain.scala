package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained PER-GROUP distinct-count (NDV) profiles —
  * the cardinality member of the maintained-distribution family, and
  * the O(1)-state counterpart of the exact re-keyed multiplicity
  * table (q_cdc_incr_distinct): one mergeable HLL sketch per group
  * (Spark's own datasketches-backed `hll_sketch_agg`), fresh from the
  * CDF. The exact table is the right tool while the per-group value
  * domain is small; at 100 TB a group's domain can be table-sized and
  * the HLL blob (bounded bytes per group, ~2% standard error at the
  * default lgConfigK=12) is the honest rung — the same trade
  * StatsMaintain already makes for the WHOLE-table NDV.
  *
  * Third instantiation of the shared [[SketchMaintain]] core: HLL
  * sketches union associatively and cannot subtract, so the identical
  * staleness algebra applies (deletes / value-changes / group-moves
  * bump `stale`; `stale/n` schedules the scoped [[refresh]]). The
  * blob merge goes through the same datasketches Union the
  * `hll_union` builtin uses, so [[read]] can derive the estimate with
  * the plain `hll_sketch_estimate` function — the stored profile is
  * readable by vanilla Spark SQL, no custom reader required. */
object NdvMaintain {

  /** Single precision knob threaded through BOTH the aggregation hook
    * and the blob-merge Union — the two sides must agree or unions
    * silently downsample to the smaller lgK (r11 ADVICE: the previous
    * code paired `hll_sketch_agg`'s engine default with a hardcoded
    * Union(12), coupled only by coincidence). */
  private val LgK = 12

  private def mergeHll(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
    import org.apache.datasketches.memory.Memory
    val u = new Union(LgK)
    u.update(HllSketch.heapify(Memory.wrap(a)))
    u.update(HllSketch.heapify(Memory.wrap(b)))
    u.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  }

  private val hooks = SketchMaintain.Hooks(
    register = _ => (),
    agg = c => hll_sketch_agg(c, lit(LgK)),
    merge = mergeHll)

  def init(spark: SparkSession, sourceDir: String, nDir: String,
           groupCols: Seq[String], valueCol: String,
           nBuckets: Int): Long =
    SketchMaintain.init(hooks, spark, sourceDir, nDir, groupCols,
      valueCol, nBuckets)

  /** Advance the profile over the CDF window (cursor, current]. Same
    * txn/no-op/retry contract as the sibling maintainers. */
  def maintain(spark: SparkSession, sourceDir: String, nDir: String,
               valueCol: String,
               toVersion: Option[Long] = None): (Long, Long) =
    SketchMaintain.maintain(hooks, spark, sourceDir, nDir, valueCol,
      toVersion)

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules. */
  def refresh(spark: SparkSession, sourceDir: String, nDir: String,
              groups: DataFrame, valueCol: String): Long =
    SketchMaintain.refresh(hooks, spark, sourceDir, nDir, groups,
      valueCol)

  /** The maintained profile with the NDV estimate derived by the
    * PLAIN `hll_sketch_estimate` builtin — proof the stored blobs are
    * vanilla-Spark-readable. */
  def read(spark: SparkSession, nDir: String): DataFrame =
    PartitionedUpsert.read(spark, nDir).drop("gkey")
      .withColumn("ndv", hll_sketch_estimate(col("sketch")))
}
