package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

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
  * Scale shape: the window's per-group sketches come from ONE
  * [[KllSketchAgg]] aggregation over the insert images (map-side
  * partials, one shuffle sized by the window); the stored blobs for
  * exactly the touched groups come from a bucket-pruned readForKeys;
  * the blob union is a distributed scalar UDF over the join — no
  * driver-side sketch state at all (unlike the whole-table profile,
  * where one blob on the driver IS the bounded design). */
object QuantileMaintain {

  private def srcApp(sourceDir: String): String =
    PartitionedUpsert.cdfApp(sourceDir)

  private val mergeBlobs = udf { (a: Array[Byte], b: Array[Byte]) =>
    if (a == null) b else if (b == null) a else KllQuantiles.merge(a, b)
  }

  private def gkeyOf(groupCols: Seq[String]) =
    struct(groupCols.map(col): _*)

  private def sketchState(state: DataFrame, groupCols: Seq[String],
                          valueCol: String, k: Int): DataFrame = {
    KllSketchAgg.register(state.sparkSession)
    state.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(KllSketchAgg.kll_agg(col(valueCol), k).as("sketch"),
        count(lit(1)).as("n"))
      .withColumn("stale", lit(0L))
  }

  /** Seed the maintained profile from the source's current committed
    * state (pinned to the recorded version — the initAggregate
    * double-apply guard). Groups whose values are all null are absent
    * (nothing to profile), like the grouped aggregate itself. */
  def init(spark: SparkSession, sourceDir: String, qDir: String,
           groupCols: Seq[String], valueCol: String, k: Int,
           nBuckets: Int): Long = {
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val state = sketchState(
      PartitionedUpsert.readVersion(spark, sourceDir, sm.version),
      groupCols, valueCol, k)
      .withColumn("gkey", gkeyOf(groupCols))
    PartitionedUpsert.init(state, qDir, "gkey", nBuckets,
      txn = Some((srcApp(sourceDir), sm.version)))
    sm.version
  }

  /** Group/value spec recovered from the maintained schema (the
    * AggMaintain.specOf convention): groups = gkey fields; the value
    * column name is not needed by maintenance (images carry it by the
    * caller's contract) so only k rides as an argument. */
  private def groupColsOf(schema: StructType): Seq[String] =
    schema("gkey").dataType.asInstanceOf[StructType].fieldNames.toSeq

  /** Advance the profile over the CDF window (cursor, current]. Insert
    * images union into the touched groups' sketches; deletes and
    * value-changing updates bump `stale`. Same txn/no-op/retry
    * contract as the sibling maintainers. */
  def maintain(spark: SparkSession, sourceDir: String, qDir: String,
               valueCol: String, k: Int,
               toVersion: Option[Long] = None): (Long, Long) =
    try attemptMaintain(spark, sourceDir, qDir, valueCol, k, toVersion)
    catch {
      case _: java.util.ConcurrentModificationException =>
        attemptMaintain(spark, sourceDir, qDir, valueCol, k, toVersion)
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("is already applied") =>
        attemptMaintain(spark, sourceDir, qDir, valueCol, k, toVersion)
    }

  private def attemptMaintain(spark: SparkSession, sourceDir: String,
                              qDir: String, valueCol: String, k: Int,
                              toVersion: Option[Long]): (Long, Long) = {
    val qm = PartitionedUpsert.currentManifest(spark, qDir).getOrElse(
      throw new IllegalStateException(
        s"$qDir is not an initialized upsert target"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val from = qm.txns.getOrElse(srcApp(sourceDir),
      throw new IllegalStateException(
        s"$qDir does not maintain quantiles of $sourceDir — init it first"))
    val to = toVersion.getOrElse(sm.version)
    if (to <= from) return (from, from)
    val groupCols = groupColsOf(qm.schema)
    KllSketchAgg.register(spark)
    val changes = PartitionedUpsert
      .changesBetweenImages(spark, sourceDir, from, to).persist()
    try {
      if (changes.isEmpty) {
        PartitionedUpsert.recordTxn(spark, qDir, srcApp(sourceDir), to)
        return (from, to)
      }
      def side(img: String, c: String) = col(s"$img.$c")
      // per-group window deltas in ONE aggregation: the insert-image
      // sketch, the insert count, and the stale bump (deletes +
      // value-changing updates)
      // an update is remove+insert when the value OR any group column
      // moved (a group-move strands the value in the old group's
      // sketch — stale there, fresh insert in the new group); an
      // unchanged row contributes nothing
      val moved = !((groupCols :+ valueCol).map(c =>
        col(s"before.$c") <=> col(s"after.$c")).reduce(_ && _))
      val contribs = changes.select(explode(array(
          // tag 1: a value entering a group's sketch
          struct(lit(1).as("__tag"),
            when(col("change_type") === "insert" ||
              (col("change_type") === "update" && moved), col("after"))
              .as("__img")),
          // tag 2: a removal the sketch cannot subtract → stale bump
          struct(lit(2).as("__tag"),
            when(col("change_type") === "delete" ||
              (col("change_type") === "update" && moved), col("before"))
              .as("__img")))).as("x"))
        .select(col("x.__tag").as("__tag"), col("x.__img").as("__img"))
        .filter(col("__img").isNotNull &&
          col(s"__img.$valueCol").isNotNull)
        .select(groupCols.map(g => col(s"__img.$g").as(g)) :+
          col("__tag") :+ col(s"__img.$valueCol").as("__v"): _*)
      val win = contribs
        .groupBy(groupCols.map(col): _*)
        .agg(
          KllSketchAgg.kll_agg(when(col("__tag") === 1, col("__v")))
            .as("__wsk"),
          sum(when(col("__tag") === 1, 1L).otherwise(0L)).as("__wn"),
          sum(when(col("__tag") === 2, 1L).otherwise(0L)).as("__wstale"))
      val keys = win.select(gkeyOf(groupCols).as("gkey")).distinct()
      val tk = keys.withColumnRenamed("gkey", "__tk")
      val prior = PartitionedUpsert.readForKeys(spark, qDir, keys, "gkey")
        .join(broadcast(tk), col("gkey") <=> col("__tk"), "left_semi")
        .drop("gkey")
        .select(groupCols.map(c => col(c).as(s"__p_$c")) ++
          Seq(col("sketch").as("__psk"), col("n").as("__pn"),
            col("stale").as("__pstale")): _*)
      val stepped = win.join(prior,
          groupCols.map(g => col(g) <=> col(s"__p_$g")).reduce(_ && _),
          "left")
        .select(
          gkeyOf(groupCols).as("gkey") +: lit(to).as("__mlsn") +:
            lit("u").as("__mop") +: (groupCols.map(col) ++ Seq(
            mergeBlobs(col("__psk"), col("__wsk")).as("sketch"),
            (coalesce(col("__pn"), lit(0L)) + col("__wn")).as("n"),
            (coalesce(col("__pstale"), lit(0L)) + col("__wstale"))
              .as("stale"))): _*)
        // a group whose window was deletes-only of null values etc.
        // still merges (stale bump); a group with NO surviving sketch
        // and no prior is noise — nothing to store yet
        .filter(col("sketch").isNotNull || col("stale") > 0)
      PartitionedUpsert.merge(spark, qDir, stepped, "gkey", "__mlsn",
        "__mop", groupCols ++ Seq("sketch", "n", "stale"), qm.nBuckets,
        txn = Some((srcApp(sourceDir), to)))
      (from, to)
    } finally { changes.unpersist(); () }
  }

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules.
    * Pass the groups a dashboard's tolerance flags; their sketches
    * rebuild from the live rows (stale resets), others stay. */
  def refresh(spark: SparkSession, sourceDir: String, qDir: String,
              groups: DataFrame, valueCol: String, k: Int): Long = {
    val qm = PartitionedUpsert.manifestOrFail(spark, qDir)
    val sm = PartitionedUpsert.manifestOrFail(spark, sourceDir)
    val groupCols = groupColsOf(qm.schema)
    val scoped = PartitionedUpsert.readVersion(spark, sourceDir, sm.version)
      .join(broadcast(groups), groupCols, "left_semi")
    val rebuilt = sketchState(scoped, groupCols, valueCol, k)
      .select(gkeyOf(groupCols).as("gkey") +:
        lit(sm.version).as("__mlsn") +: lit("u").as("__mop") +:
        (groupCols ++ Seq("sketch", "n", "stale")).map(col): _*)
    PartitionedUpsert.merge(spark, qDir, rebuilt, "gkey", "__mlsn",
      "__mop", groupCols ++ Seq("sketch", "n", "stale"),
      qm.nBuckets).length.toLong
  }

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
