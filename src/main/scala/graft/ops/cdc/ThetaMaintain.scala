package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ThetaSketchAgg

/** Incrementally maintained PER-GROUP audience profiles (theta
  * sketches) — the set-operation member of the maintained-
  * distribution family: where [[NdvMaintain]] answers "how many
  * distinct per group", the theta blob additionally answers the
  * CROSS-GROUP questions ("how many users does segment A share with
  * segment B?") directly on the stored profiles via
  * [[ThetaSketchAgg.intersect]]/[[ThetaSketchAgg.aNotB]] — the
  * audience-overlap dashboard over a CDC-maintained table, no source
  * rescans.
  *
  * Fourth instantiation of the shared [[SketchMaintain]] core: theta
  * unions are associative, subtraction is unsupported (a theta AnotB
  * against a delete-set would need the delete-set sketch maintained
  * too — and removals from a SAMPLED set are not sound), so the
  * identical staleness algebra applies. `k` must be a power of 2;
  * exact-mode contract as in ThetaSketchAgg. */
object ThetaMaintain {

  private def hooks(k: Int) = SketchMaintain.Hooks(
    register = ThetaSketchAgg.register,
    agg = c => ThetaSketchAgg.theta_agg(c, k),
    merge = (a, b) => ThetaSketchAgg.union(a, b, k))

  def init(spark: SparkSession, sourceDir: String, tDir: String,
           groupCols: Seq[String], valueCol: String, k: Int,
           nBuckets: Int): Long =
    SketchMaintain.init(hooks(k), spark, sourceDir, tDir, groupCols,
      valueCol, nBuckets)

  /** Advance the profile over the CDF window (cursor, current]. Same
    * txn/no-op/retry contract as the sibling maintainers. */
  def maintain(spark: SparkSession, sourceDir: String, tDir: String,
               valueCol: String, k: Int,
               toVersion: Option[Long] = None): (Long, Long) =
    SketchMaintain.maintain(hooks(k), spark, sourceDir, tDir, valueCol,
      toVersion)

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules. */
  def refresh(spark: SparkSession, sourceDir: String, tDir: String,
              groups: DataFrame, valueCol: String, k: Int): Long =
    SketchMaintain.refresh(hooks(k), spark, sourceDir, tDir, groups,
      valueCol)

  /** The maintained profile with per-group cardinality estimates. */
  def read(spark: SparkSession, tDir: String): DataFrame = {
    val est = udf { (blob: Array[Byte]) =>
      if (blob == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(
        math.round(ThetaSketchAgg.estimate(blob))) }
    PartitionedUpsert.read(spark, tDir).drop("gkey")
      .withColumn("ndv", est(col("sketch")))
  }

  /** Cross-group overlap report over the STORED profiles: for every
    * group pair, |A∩B| (and the inputs' cardinalities) — the question
    * the theta member of the family exists for. Runs on the profile
    * table (≤ |groups| rows), never the source. */
  def overlaps(spark: SparkSession, tDir: String): DataFrame = {
    val inter = udf { (x: Array[Byte], y: Array[Byte]) =>
      math.round(ThetaSketchAgg.estimate(
        ThetaSketchAgg.intersect(x, y))) }
    val est = udf { (blob: Array[Byte]) =>
      math.round(ThetaSketchAgg.estimate(blob)) }
    val p = PartitionedUpsert.read(spark, tDir)
      .select(col("gkey"), col("sketch"))
    val a = p.select(col("gkey").as("ga"), col("sketch").as("sa"))
    val b = p.select(col("gkey").as("gb"), col("sketch").as("sb"))
    a.join(b, expr("ga < gb"))
      .select(col("ga"), col("gb"),
        est(col("sa")).as("n_a"), est(col("sb")).as("n_b"),
        inter(col("sa"), col("sb")).as("n_intersect"))
  }
}
