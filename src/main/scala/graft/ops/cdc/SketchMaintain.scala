package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic core of the maintained PER-GROUP mergeable-sketch profile —
  * the machinery [[QuantileMaintain]] (KLL distributions) and
  * [[FreqMaintain]] (frequent items) share. Any sketch that is (a)
  * associatively mergeable and (b) NOT subtractable maintains the same
  * way: window deltas fold in with ONE grouped sketch aggregation over
  * the insert images, stored blobs for exactly the touched groups come
  * back via bucket-pruned readForKeys, blob union is a distributed
  * scalar over the join, and deletes / value-changes / group-moves
  * bump a per-group `stale` counter whose ratio schedules the scoped
  * [[refresh]]. The instantiations differ ONLY in the aggregate
  * expression and the blob-merge function — which is exactly the
  * [[Hooks]] surface.
  *
  * Scale shape (inherited by every instantiation): the window
  * aggregation shuffles window-sized partials (map-side combine from
  * the TypedImperativeAggregate), the prior read is bucket-pruned to
  * the touched groups, and no sketch state ever lives on the driver.
  */
object SketchMaintain {

  /** The per-sketch-type surface: register the SQL functions, build
    * the grouped aggregate over a value column, merge two blobs. */
  final case class Hooks(
      register: SparkSession => Unit,
      agg: Column => Column,
      merge: (Array[Byte], Array[Byte]) => Array[Byte])

  private def srcApp(sourceDir: String): String =
    PartitionedUpsert.cdfApp(sourceDir)

  private def gkeyOf(groupCols: Seq[String]) =
    struct(groupCols.map(col): _*)

  private def sketchState(hooks: Hooks, state: DataFrame,
                          groupCols: Seq[String],
                          valueCol: String): DataFrame = {
    hooks.register(state.sparkSession)
    state.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(hooks.agg(col(valueCol)).as("sketch"),
        count(lit(1)).as("n"))
      .withColumn("stale", lit(0L))
  }

  /** Seed the maintained profile from the source's current committed
    * state (pinned to the recorded version — the initAggregate
    * double-apply guard). Groups whose values are all null are absent
    * (nothing to profile), like the grouped aggregate itself. */
  def init(hooks: Hooks, spark: SparkSession, sourceDir: String,
           tDir: String, groupCols: Seq[String], valueCol: String,
           nBuckets: Int): Long = {
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val state = sketchState(hooks,
      PartitionedUpsert.readVersion(spark, sourceDir, sm.version),
      groupCols, valueCol)
      .withColumn("gkey", gkeyOf(groupCols))
    PartitionedUpsert.init(state, tDir, "gkey", nBuckets,
      txn = Some((srcApp(sourceDir), sm.version)))
    sm.version
  }

  private def groupColsOf(schema: StructType): Seq[String] =
    schema("gkey").dataType.asInstanceOf[StructType].fieldNames.toSeq

  /** Advance the profile over the CDF window (cursor, current]. Insert
    * images union into the touched groups' sketches; deletes and
    * value-changing updates bump `stale`. Same txn/no-op/retry
    * contract as the sibling maintainers. */
  def maintain(hooks: Hooks, spark: SparkSession, sourceDir: String,
               tDir: String, valueCol: String,
               toVersion: Option[Long]): (Long, Long) =
    try attemptMaintain(hooks, spark, sourceDir, tDir, valueCol, toVersion)
    catch {
      case _: java.util.ConcurrentModificationException =>
        attemptMaintain(hooks, spark, sourceDir, tDir, valueCol, toVersion)
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("is already applied") =>
        attemptMaintain(hooks, spark, sourceDir, tDir, valueCol, toVersion)
    }

  private def attemptMaintain(hooks: Hooks, spark: SparkSession,
                              sourceDir: String, tDir: String,
                              valueCol: String,
                              toVersion: Option[Long]): (Long, Long) = {
    val tm = PartitionedUpsert.currentManifest(spark, tDir).getOrElse(
      throw new IllegalStateException(
        s"$tDir is not an initialized upsert target"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val from = tm.txns.getOrElse(srcApp(sourceDir),
      throw new IllegalStateException(
        s"$tDir does not maintain a profile of $sourceDir — init it first"))
    val to = toVersion.getOrElse(sm.version)
    if (to <= from) return (from, from)
    val groupCols = groupColsOf(tm.schema)
    hooks.register(spark)
    val mergeBlobs = udf { (a: Array[Byte], b: Array[Byte]) =>
      if (a == null) b else if (b == null) a else hooks.merge(a, b)
    }
    val changes = PartitionedUpsert
      .changesBetweenImages(spark, sourceDir, from, to).persist()
    try {
      if (changes.isEmpty) {
        PartitionedUpsert.recordTxn(spark, tDir, srcApp(sourceDir), to)
        return (from, to)
      }
      // per-group window deltas in ONE aggregation: the insert-image
      // sketch, the insert count, and the stale bump (deletes +
      // value-changing updates); an update is remove+insert when the
      // value OR any group column moved (a group-move strands the
      // value in the old group's sketch — stale there, fresh insert
      // in the new group); an unchanged row contributes nothing
      val moved = !((groupCols :+ valueCol).map(c =>
        col(s"before.$c") <=> col(s"after.$c")).reduce(_ && _))
      val contribs = changes.select(explode(array(
          struct(lit(1).as("__tag"),
            when(col("change_type") === "insert" ||
              (col("change_type") === "update" && moved), col("after"))
              .as("__img")),
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
          hooks.agg(when(col("__tag") === 1, col("__v"))).as("__wsk"),
          sum(when(col("__tag") === 1, 1L).otherwise(0L)).as("__wn"),
          sum(when(col("__tag") === 2, 1L).otherwise(0L)).as("__wstale"))
      val keys = win.select(gkeyOf(groupCols).as("gkey")).distinct()
      val tk = keys.withColumnRenamed("gkey", "__tk")
      val prior = PartitionedUpsert.readForKeys(spark, tDir, keys, "gkey")
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
        // a group whose window was deletes-only still merges (stale
        // bump); a group with NO surviving sketch and no prior is
        // noise — nothing to store yet
        .filter(col("sketch").isNotNull || col("stale") > 0)
      PartitionedUpsert.merge(spark, tDir, stepped, "gkey", "__mlsn",
        "__mop", groupCols ++ Seq("sketch", "n", "stale"), tm.nBuckets,
        txn = Some((srcApp(sourceDir), to)))
      (from, to)
    } finally { changes.unpersist(); () }
  }

  /** Exact re-profile of the given groups at the source's current
    * version — the scoped-rescan escape hatch `stale/n` schedules. */
  def refresh(hooks: Hooks, spark: SparkSession, sourceDir: String,
              tDir: String, groups: DataFrame,
              valueCol: String): Long = {
    val tm = PartitionedUpsert.manifestOrFail(spark, tDir)
    val sm = PartitionedUpsert.manifestOrFail(spark, sourceDir)
    val groupCols = groupColsOf(tm.schema)
    val scoped = PartitionedUpsert.readVersion(spark, sourceDir, sm.version)
      .join(broadcast(groups), groupCols, "left_semi")
    val rebuilt = sketchState(hooks, scoped, groupCols, valueCol)
      .select(gkeyOf(groupCols).as("gkey") +:
        lit(sm.version).as("__mlsn") +: lit("u").as("__mop") +:
        (groupCols ++ Seq("sketch", "n", "stale")).map(col): _*)
    PartitionedUpsert.merge(spark, tDir, rebuilt, "gkey", "__mlsn",
      "__mop", groupCols ++ Seq("sketch", "n", "stale"),
      tm.nBuckets).length.toLong
  }
}
