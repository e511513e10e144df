package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fk → [pk] companion index for a [[JoinMaintain]] materialization —
  * the hot-dim upgrade path its scaladoc promises: with the index, a
  * dim change finds the join rows to re-derive by POINT LOOKUPS
  * (index row per changed dim key → pk list → bucket-pruned join
  * reads) instead of an fk-filtered scan of the whole join table.
  *
  * The index is simply ANOTHER derived table of the fact source —
  * maintained from the fact CDF exactly like [[AggMaintain]]'s
  * aggregates (it IS a grouped aggregate: collect_set(pk) per fk),
  * with its own cursor in its own manifest. No cross-table commit
  * seam exists by construction: a crash leaves the index lagging, and
  * the next [[maintain]] catches it up from the fact CDF before
  * anyone reads it.
  *
  * Bounded rows: a hub fk (one dim key referenced by half the fact
  * table) would make its pk array a scale hazard, so arrays cap at
  * `maxRefs` — recorded in the index's own manifest at init, so
  * maintenance can never silently use a different cap — and the row
  * is flagged `overflowed`, STICKY, because a truncated list can no
  * longer prove completeness. Lookups route overflowed fks to the
  * fk-filtered scan restricted to just those keys (correctness never
  * depends on the index being complete; the index only prunes — the
  * [[JoinMaintain]] integration feeds its result through the SAME
  * deltaRows semantics as the scan path). */
object FkIndex {

  import PartitionedUpsert.{cdfApp, manifestOrFail}

  /** Default cap on pks stored per fk before the row is flagged
    * overflowed and lookups fall back to a restricted scan. */
  val DefaultMaxRefs = 16384

  /** The init-time cap rides the index's txn map under this key (the
    * map is the manifest's only extensible metadata; a cfg: prefix
    * keeps it out of the cursor namespace). */
  private val CapKey = "cfg:maxRefs"

  /** Build the index from the fact table's committed state at
    * `atVersion` (default: current), recording the version it reflects
    * (read pinned — the initAggregate TOCTOU rule; [[JoinMaintain]]
    * pins it to the version its own seed recorded, so the index can
    * never start AHEAD of the join). */
  def init(spark: SparkSession, factDir: String, idxDir: String,
           fkCol: String, nBuckets: Int,
           maxRefs: Int = DefaultMaxRefs,
           atVersion: Option[Long] = None): Long = {
    val fm0 = manifestOrFail(spark, factDir)
    // resolve the manifest OF version v, not current-with-version-v:
    // keyCol/schema must describe the data actually read (the fact's
    // key or schema may have evolved between v and current)
    val fm = atVersion.fold(fm0)(v =>
      PartitionedUpsert.manifestAt(spark, factDir, v))
    val pk = fm.keyCol
    val rows = PartitionedUpsert.readVersion(spark, factDir, fm.version)
      .filter(col(fkCol).isNotNull)
      .groupBy(col(fkCol))
      .agg(sort_array(collect_list(col(pk))).as("__all"))
      .select(col(fkCol), slice(col("__all"), 1, maxRefs).as("pks"),
        (size(col("__all")) > maxRefs).as("overflowed"))
    PartitionedUpsert.initWith(rows, idxDir, fkCol, nBuckets,
      txns = Seq(cdfApp(factDir) -> fm.version, CapKey -> maxRefs.toLong))
    fm.version
  }

  /** Advance the index from the fact CDF, to `toVersion` (default:
    * the fact's current version). Only fk TRANSITIONS matter: a row
    * whose fk is unchanged (the common value-update) contributes
    * nothing, so the delta is usually far smaller than the change
    * set. Empty transition windows advance the cursor as a metadata
    * no-op (the mergeWith lesson). The cap is read from the index's
    * own manifest — callers cannot drift it.
    *
    * [[JoinMaintain]] pins `toVersion` to the fact version ITS step
    * reads, so a fact commit landing concurrently cannot advance the
    * index past the window being joined. Returns (from, to) as
    * recorded; **from > to means the index is already AHEAD of the
    * pinned target** (another maintainer advanced it) — the caller
    * must NOT use the index for a window older than `from` (a pk
    * retargeted after `to` is already gone from its old fk's row);
    * JoinMaintain falls back to the scan path in that case. */
  def maintain(spark: SparkSession, factDir: String, idxDir: String,
               toVersion: Option[Long] = None): (Long, Long) = {
    val im = manifestOrFail(spark, idxDir)
    val fm = manifestOrFail(spark, factDir)
    val from = im.txns.getOrElse(cdfApp(factDir),
      throw new IllegalStateException(
        s"$idxDir does not index $factDir — init it first"))
    val maxRefs = im.txns.getOrElse(CapKey, DefaultMaxRefs.toLong).toInt
    val to = toVersion.getOrElse(fm.version)
    if (to <= from) return (from, to)
    val pk = fm.keyCol
    val fkCol = im.keyCol
    val moves = PartitionedUpsert.changesBetweenImages(spark, factDir,
        from, to)
      .select(col(pk), col(s"before.$fkCol").as("__ofk"),
        col(s"after.$fkCol").as("__nfk"))
      .filter(!(col("__ofk") <=> col("__nfk")))
      .persist()
    try {
      if (moves.isEmpty) {
        PartitionedUpsert.recordTxn(spark, idxDir, cdfApp(factDir), to)
        return (from, to)
      }
      val delta = moves.filter(col("__ofk").isNotNull)
        .select(col("__ofk").as(fkCol), col(pk), lit(-1).as("__sign"))
        .unionByName(moves.filter(col("__nfk").isNotNull)
          .select(col("__nfk").as(fkCol), col(pk), lit(1).as("__sign")))
        .groupBy(col(fkCol))
        .agg(
          sort_array(collect_list(when(col("__sign") === 1, col(pk))))
            .as("__adds"),
          sort_array(collect_list(when(col("__sign") === -1, col(pk))))
            .as("__removes"))
      val prior = PartitionedUpsert.readForKeys(spark, idxDir,
        delta.select(col(fkCol)), fkCol)
      val emptyArr = array().cast("array<long>")
      val merged = delta.join(prior, Seq(fkCol), "left_outer")
        .withColumn("__new", sort_array(array_union(
          array_except(coalesce(col("pks"), emptyArr), col("__removes")),
          col("__adds"))))
        .select(col(fkCol),
          slice(col("__new"), 1, maxRefs).as("pks"),
          (coalesce(col("overflowed"), lit(false)) ||
            size(col("__new")) > maxRefs).as("overflowed"))
      val changeLog = merged.select(
        col(fkCol), lit(to).as("__lsn"),
        // an emptied, never-overflowed row is provably memberless →
        // delete; an overflowed row stays (its true membership is
        // unknown — the scan fallback still needs the flag)
        when(size(col("pks")) === 0 && !col("overflowed"), "d")
          .otherwise("u").as("__op"),
        col("pks"), col("overflowed"))
      val touched = PartitionedUpsert.mergeWith(spark, idxDir, changeLog,
        fkCol, "__lsn", "__op", Seq("pks", "overflowed"), im.nBuckets,
        txns = Seq(cdfApp(factDir) -> to))
      if (touched.isEmpty)
        PartitionedUpsert.recordTxn(spark, idxDir, cdfApp(factDir), to)
      (from, to)
    } finally { moves.unpersist(); () }
  }

  /** Point-lookup the index for a set of fks: returns (pkKeys,
    * hubFks) — pk rows for the well-indexed fks (feed readForKeys on
    * the join table) and the overflowed fks that still need the
    * restricted scan. readForKeys returns whole touched BUCKETS, so
    * the rows are re-filtered to the requested fks here — otherwise
    * an unrelated hub fk sharing a bucket would fire the scan
    * fallback spuriously. Both frames are bounded by the lookup set. */
  def lookup(spark: SparkSession, idxDir: String,
             fks: DataFrame): (DataFrame, DataFrame) = {
    val im = manifestOrFail(spark, idxDir)
    val fkCol = im.keyCol
    val rows = PartitionedUpsert.readForKeys(spark, idxDir,
        fks.select(col(fkCol)), fkCol)
      .join(fks.select(col(fkCol)), Seq(fkCol), "left_semi")
    (rows.filter(!col("overflowed")).select(explode(col("pks")).as("__pk")),
     rows.filter(col("overflowed")).select(col(fkCol)))
  }
}
