package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Incremental maintenance of a grouped aggregate from the change data
  * feed — "keep this groupBy-sum dashboard table fresh without
  * recomputing 100 TB", the standard CDC-automation ask once a replica
  * exists.
  *
  * The maintained measures are the DELTA-COMPOSABLE ones: row count,
  * and per measure column `c` a null-coalesced sum `s_c` plus a
  * non-null count `n_c` (so SQL `sum`/`avg` null semantics — NULL when
  * every input is NULL, nulls excluded from avg — derive exactly in
  * [[exposed]]). min/max do NOT compose from deltas (a deleted row may
  * have BEEN the max; recomputing its group needs the keyed rows) and
  * are deliberately out of scope — the honest boundary of
  * delta-maintenance everywhere (same restriction as materialized-view
  * fast refresh in any engine).
  *
  * Scale shape: a maintenance step reads the CDF of the version window
  * (O(changed buckets) — untouched source buckets are skipped by
  * manifest comparison alone, zero reads), aggregates the ±image
  * contributions down to one delta row per TOUCHED GROUP (tiny — the
  * only shuffle is group-keyed), reads exactly the aggregate buckets
  * those groups hash to (readForKeys path pruning), and merges through
  * the manifest-committed upsert with the source version as the
  * transaction id — so replays are metadata no-ops and a crash
  * anywhere leaves the previous aggregate fully readable. Nothing in
  * the step is sized by the source table.
  */
object AggMaintain {

  /** Internal maintained columns for a measure spec: `cnt` plus
    * (`s_c`, `n_c`) per measure column. */
  def measureCols(sumCols: Seq[String]): Seq[String] =
    "cnt" +: sumCols.flatMap(c => Seq(s"s_$c", s"n_$c"))

  /** Full recompute of the internal aggregate state — used to seed the
    * maintained table and by specs as the equivalence reference. */
  def fullAggregate(state: DataFrame, groupCols: Seq[String],
                    sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1L)).as("cnt") +: sumCols.flatMap { c =>
      val dt = state.schema(c).dataType
      Seq(sum(coalesce(col(c), lit(0).cast(dt))).as(s"s_$c"),
        count(col(c)).as(s"n_$c"))
    }
    state.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Row-level diff of two keyed states with BEFORE and AFTER images —
    * the general CDF record (Delta's update_preimage/postimage pair,
    * folded into one row). Output: key cols, `change_type` ∈
    * insert/update/delete, `before` / `after` structs of the value
    * columns (null struct on the missing side of insert/delete). */
  def diffImages(old: DataFrame, neu: DataFrame, keys: Seq[String],
                 valueCols: Seq[String]): DataFrame = {
    val fp = Cdc.rowFingerprint(valueCols)
    val o = old.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("before") :+ fp.as("__ofp"): _*)
    val n = neu.select(keys.map(col) :+
      struct(valueCols.map(col): _*).as("after") :+ fp.as("__nfp"): _*)
    o.join(n, keys, "full_outer")
      .filter(col("__ofp").isNull || col("__nfp").isNull ||
        col("__ofp") =!= col("__nfp"))
      .select(keys.map(col) :+
        when(col("__ofp").isNull, "insert")
          .when(col("__nfp").isNull, "delete")
          .otherwise("update").as("change_type") :+
        col("before") :+ col("after"): _*)
  }

  /** Per-group measure deltas from an image diff: every change
    * contributes its before-image with sign −1 and its after-image
    * with sign +1, so an update that MOVES a row between groups
    * decrements the old group and increments the new one — group
    * migration needs no special case. One group-keyed shuffle over
    * rows sized by the CHANGE SET, never the table. */
  def deltaAggregate(changes: DataFrame, groupCols: Seq[String],
                     sumCols: Seq[String]): DataFrame = {
    val fields = groupCols ++ sumCols
    val contrib = changes.select(explode(array(
        struct(lit(-1L).as("__sign"), col("before").as("__img")),
        struct(lit(1L).as("__sign"), col("after").as("__img")))).as("c"))
      .filter(col("c.__img").isNotNull)
      .select(col("c.__sign").as("__sign") +:
        fields.map(f => col(s"c.__img.$f").as(f)): _*)
    val aggs = sum(col("__sign")).as("cnt") +: sumCols.flatMap { c =>
      val dt = contrib.schema(c).dataType
      Seq(sum(col("__sign") * coalesce(col(c), lit(0).cast(dt))).as(s"s_$c"),
        sum(when(col(c).isNotNull, col("__sign")).otherwise(lit(0L))).as(s"n_$c"))
    }
    contrib.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge per-group deltas into the prior aggregate WITHOUT dropping
    * vanished groups (cnt falls to 0 — the maintenance path needs them
    * as delete ops). Join is null-safe on the group columns (a NULL
    * group value is a real group in SQL aggregation). `joinType`
    * "full_outer" keeps prior-only groups (pure composition);
    * "right_outer" restricts to delta groups (the maintenance step,
    * where prior-only groups are untouched by construction). Measures
    * are cast back to the prior schema's types so the maintained table
    * schema never widens drift-style across steps. */
  private def mergedRows(prior: DataFrame, deltas: DataFrame,
                         groupCols: Seq[String], sumCols: Seq[String],
                         joinType: String): DataFrame = {
    val ms = measureCols(sumCols)
    val d = deltas.select(deltas.columns.toSeq.map(c =>
      col(c).as(if (ms.contains(c)) s"__d_$c" else s"__g_$c")): _*)
    val cond = groupCols.map(g => prior(g) <=> d(s"__g_$g")).reduce(_ && _)
    val joined = prior.join(d, cond, joinType)
    joined.select(
      groupCols.map(g => coalesce(prior(g), d(s"__g_$g")).as(g)) ++
        ms.map { m =>
          (coalesce(prior(m), lit(0)) + coalesce(d(s"__d_$m"), lit(0)))
            .cast(prior.schema(m).dataType).as(m)
        }: _*)
  }

  /** Apply per-group deltas to a prior aggregate state: the pure
    * composition `agg(S₂) = deltaApply(agg(S₁), deltaAggregate(diff(S₁,
    * S₂)))` — the algebra the oracled twin q_cdc_incr_agg proves
    * cross-engine. Groups whose count reaches zero vanish, exactly as
    * they would from a direct aggregate of the new state. */
  def deltaApply(prior: DataFrame, deltas: DataFrame, groupCols: Seq[String],
                 sumCols: Seq[String]): DataFrame =
    mergedRows(prior, deltas, groupCols, sumCols, "full_outer")
      .filter(col("cnt") > 0)

  /** SQL-semantics view over the internal state: `sum_c` is NULL when
    * the group has no non-null values, `avg_c` excludes nulls —
    * identical to what `sum(c)` / `avg(c)` over the base table yield. */
  def exposed(agg: DataFrame, groupCols: Seq[String],
              sumCols: Seq[String]): DataFrame =
    agg.select(groupCols.map(col) ++ (col("cnt") +: sumCols.flatMap(c => Seq(
      when(col(s"n_$c") > 0, col(s"s_$c")).as(s"sum_$c"),
      when(col(s"n_$c") > 0,
        col(s"s_$c").cast(DoubleType) / col(s"n_$c")).as(s"avg_$c")))): _*)

  // -------------------------------------------------------------------
  // Table-backed maintenance: aggDir is itself a PartitionedUpsert
  // target keyed by `gkey` = struct(groupCols), with the last-applied
  // SOURCE version recorded in the manifest's transaction map — the
  // same mechanism that makes streaming merges exactly-once makes a
  // replayed maintenance step a metadata no-op.
  // -------------------------------------------------------------------

  private def srcApp(sourceDir: String): String =
    PartitionedUpsert.cdfApp(sourceDir)

  private def gkeyOf(groupCols: Seq[String]): Column =
    struct(groupCols.map(col): _*)

  /** Seed the maintained aggregate from the source table's CURRENT
    * committed state (one full aggregate — the only O(source) step in
    * the lifecycle) and record the source version it reflects. */
  def initAggregate(spark: SparkSession, sourceDir: String, aggDir: String,
                    groupCols: Seq[String], sumCols: Seq[String],
                    nBuckets: Int): Long = {
    // group names may not collide with the maintained measure columns
    // (cnt / s_* / n_*): specOf recovers the spec from the schema, and
    // a group named like a measure would be misclassified — reject
    // loudly at the only moment the caller states the spec explicitly
    groupCols.foreach(g => require(
      g != "cnt" && !g.startsWith("s_") && !g.startsWith("n_"),
      s"group column '$g' collides with the maintained measure naming " +
        s"(cnt / s_* / n_*) — rename it before maintaining an aggregate"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    // read PINNED to the recorded version: a merge committing between
    // the manifest resolve and an unpinned read would seed an aggregate
    // that already contains version N+1 while the txn records N — the
    // next maintain step would then double-apply N→N+1's deltas
    val agg = fullAggregate(
        PartitionedUpsert.readVersion(spark, sourceDir, sm.version),
        groupCols, sumCols)
      .withColumn("gkey", gkeyOf(groupCols))
    PartitionedUpsert.init(agg, aggDir, "gkey", nBuckets,
      txn = Some((srcApp(sourceDir), sm.version)))
    sm.version
  }

  /** The maintained aggregate's exposed view (group cols + cnt +
    * per-measure sum and avg with SQL null semantics). */
  def readAggregate(spark: SparkSession, aggDir: String): DataFrame = {
    val am = PartitionedUpsert.currentManifest(spark, aggDir).getOrElse(
      throw new IllegalStateException(
        s"$aggDir is not an initialized upsert target"))
    val (groupCols, sumCols) = specOf(am.schema)
    exposed(PartitionedUpsert.read(spark, aggDir), groupCols, sumCols)
  }

  /** Group/measure spec recovered from the maintained schema itself —
    * group columns are the gkey struct's fields, measure columns are
    * the `s_<c>` survivors — so maintain calls cannot drift from the
    * spec the table was initialized with. */
  private def specOf(schema: StructType): (Seq[String], Seq[String]) = {
    val groupCols = schema("gkey").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq
    val sumCols = schema.fieldNames.toSeq.collect {
      case s if s.startsWith("s_") => s.stripPrefix("s_")
    }
    (groupCols, sumCols)
  }

  /** Advance the maintained aggregate to the source's current version
    * by consuming the CDF of the window — never recomputing. Returns
    * (fromVersion, toVersion) applied; from == to means the aggregate
    * was already current (zero data reads — two manifest lookups).
    * Idempotent: the merge carries txn (cdf:<sourceDir>, toVersion),
    * so a replay after a crash-past-commit is a metadata no-op, and a
    * crash before commit leaves the prior aggregate readable with the
    * step simply re-run. Concurrent maintainers (zombie vs takeover
    * driver both running a maintenance sink) resolve like
    * [[JoinMaintain.maintainJoin]]: the loser of the manifest publish
    * race retries once from fresh manifests, where the remaining
    * window shrinks to what is genuinely unapplied (possibly empty —
    * the already-current fast path). */
  def maintainAggregate(spark: SparkSession, sourceDir: String,
                        aggDir: String,
                        toVersion: Option[Long] = None): (Long, Long) =
    try attemptMaintain(spark, sourceDir, aggDir, toVersion)
    catch {
      case _: java.util.ConcurrentModificationException =>
        attemptMaintain(spark, sourceDir, aggDir, toVersion)
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("is already applied") =>
        // another maintainer advanced our cursor between this step's
        // manifest read and its merge — re-resolve; the window is now
        // smaller or already closed
        attemptMaintain(spark, sourceDir, aggDir, toVersion)
    }

  private def attemptMaintain(spark: SparkSession, sourceDir: String,
                              aggDir: String,
                              toVersion: Option[Long]): (Long, Long) = {
    val am = PartitionedUpsert.currentManifest(spark, aggDir).getOrElse(
      throw new IllegalStateException(
        s"$aggDir is not an initialized upsert target"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val from = am.txns.getOrElse(srcApp(sourceDir),
      throw new IllegalStateException(
        s"$aggDir does not maintain an aggregate of $sourceDir — " +
          s"initAggregate it first (txn key ${srcApp(sourceDir)} absent)"))
    // an explicit pin makes coordinated DAG rounds possible: every
    // sibling target advances to the SAME source version, so a
    // consistent cross-target read point exists (DagRead)
    val to = toVersion.getOrElse(sm.version)
    if (to <= from) return (from, from)
    val (groupCols, sumCols) = specOf(am.schema)
    // pinned: the distinct-bucket collect inside readForKeys and the
    // merge below must see the SAME delta rows (IvfIndex append
    // precedent — an unpersisted pipeline re-evaluates per action)
    val deltas = deltaAggregate(
      PartitionedUpsert.changesBetweenImages(spark, sourceDir, from, to),
      groupCols, sumCols).persist()
    try {
      // a window that nets ZERO row changes (source compact/rebucket:
      // paths move, fingerprints identical) must still advance the
      // recorded txn — an empty merge skips it, and the stale `from`
      // would make every later call re-diff the same rewritten buckets
      // (a FULL-table diff forever after a rebucket)
      if (deltas.isEmpty) {
        PartitionedUpsert.recordTxn(spark, aggDir, srcApp(sourceDir), to)
        return (from, to)
      }
      // prior values of exactly the touched groups' buckets; right
      // outer keeps the change log sized by the delta group set
      val prior = PartitionedUpsert.readForKeys(spark, aggDir,
        deltas.select(gkeyOf(groupCols).as("gkey")), "gkey").drop("gkey")
      val merged = mergedRows(prior, deltas, groupCols, sumCols, "right_outer")
      val changeLog = merged.select(
        gkeyOf(groupCols).as("gkey") +:
          lit(to).as("lsn") +:
          when(col("cnt") <= 0, "d").otherwise("u").as("op") +:
          (groupCols ++ measureCols(sumCols)).map(col): _*)
      PartitionedUpsert.merge(spark, aggDir, changeLog, "gkey", "lsn", "op",
        groupCols ++ measureCols(sumCols), am.nBuckets,
        txn = Some((srcApp(sourceDir), to)))
      (from, to)
    } finally { deltas.unpersist(); () }
  }
}
