package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized two-table JOIN from the
  * change data feeds of both sources — the second rung of derived-table
  * automation after [[AggMaintain]]: "keep this fact⋈dim enrichment
  * table fresh without re-joining 100 TB".
  *
  * The maintained shape is the LEFT-OUTER join of a fact table onto a
  * dimension table (fact.fk = dim.key), keyed by the fact key — one
  * output row per fact row, dimension columns null when unmatched,
  * plus an explicit matched marker. Storing the OUTER join (and
  * exposing inner as a filter) is what makes maintenance O(changes):
  * a fact row whose fk dangles stays in the materialization, so when
  * the dimension key later arrives, the rows to resurrect are found by
  * an fk filter on the materialization itself — no O(fact) scan for
  * "rows that joined to nothing" (they are exactly the unmatched rows
  * already stored).
  *
  * Delta algebra per step (the part the oracled twin q_cdc_incr_join
  * proves cross-engine): a join row changes iff its FACT side changed
  * (re-derive from the fact after-image, point-looking-up dim) or its
  * fk hits a CHANGED dim key (re-derive its dim side; the fact side is
  * untouched by construction). Fact deletes delete. Everything is
  * sized by the two change sets — never by either table.
  *
  * Scale shape of the table-backed step: the fact CDF is O(changed
  * fact buckets) (manifest-diff pruning), the dim lookup is a
  * readForKeys point read (O(touched fks)), and the merge rewrites
  * only the touched join buckets. The one scan-shaped read is finding
  * join rows with fk ∈ changed-dim-keys: the materialization is
  * bucketed by fact key, so this is an fk-filtered columnar scan of
  * the join table (narrow: key + fk), with the dim-key set broadcast.
  * At 100 TB with a hot dim-change rate, the upgrade path is a
  * companion fk→pk index table maintained like HistoricalNearDup's
  * band index; for the common dim-change cadence (slowly changing
  * dimensions), the narrow scan per maintenance window is the honest,
  * simple cost and is documented here rather than hidden.
  */
object JoinMaintain {

  /** Marker column: present and true/false per row; its NAME carries
    * the fk column so the maintained table is self-describing (specOf
    * recovers fact/dim column split and the join key from the schema
    * alone — maintain calls cannot drift from the init-time spec). */
  def markerCol(fkCol: String): String = s"__joined_on__$fkCol"

  /** The maintained shape: fact LEFT OUTER dim on fact(fk) = dim(dk).
    * Output: fact key, fact value columns (fk among them), the matched
    * marker, then dim value columns (null when unmatched). Also the
    * full-recompute reference for specs and the oracled twin. */
  def fullJoin(fact: DataFrame, dim: DataFrame, pkCol: String, fkCol: String,
               dkCol: String, factCols: Seq[String],
               dimCols: Seq[String]): DataFrame = {
    require(factCols.contains(fkCol),
      s"fk column '$fkCol' must be one of the fact value columns")
    require(!dimCols.contains(dkCol),
      s"dim key '$dkCol' may not repeat among the dim value columns")
    // dkCol included: a dim key named like the fact fk (the standard
    // same-name star-schema join) would otherwise pass this guard and
    // die later as an ambiguous-reference AnalysisException
    val overlap = (Set(pkCol) ++ factCols).intersect((dkCol +: dimCols).toSet)
    require(overlap.isEmpty,
      s"fact and dim column names must be disjoint (clash: $overlap) — " +
        s"alias one side before materializing the join")
    val d = dim.select((dkCol +: dimCols).map(col): _*)
    fact.select((pkCol +: factCols).map(col): _*)
      .join(d, col(fkCol) === col(dkCol), "left_outer")
      .select((col(pkCol) +: factCols.map(col)) ++
        (col(dkCol).isNotNull.as(markerCol(fkCol)) +: dimCols.map(col)): _*)
  }

  /** Apply one maintenance step to a prior materialization, purely:
    * `fullJoin(F₂, D₂) == deltaApply(fullJoin(F₁, D₁), diffImages(F₁,
    * F₂), changedDimKeys, D₂)` — the algebra the oracled twin
    * q_cdc_incr_join proves cross-engine and the table-backed
    * [[maintainJoin]] runs against real CDFs.
    *
    * `factDiff` is [[AggMaintain.diffImages]] over the fact states
    * (valueCols = factCols); `dimKeys` is the distinct set of dim keys
    * inserted/updated/deleted in the window (one `dkCol` column);
    * `dim2` is the NEW dim state. */
  def deltaApply(priorJ: DataFrame, factDiff: DataFrame, dimKeys: DataFrame,
                 dim2: DataFrame, pkCol: String, fkCol: String, dkCol: String,
                 factCols: Seq[String], dimCols: Seq[String]): DataFrame = {
    val (factUpserts, factDeletes, dimTouched) = deltaRows(priorJ, factDiff,
      dimKeys, pkCol, fkCol, dkCol, factCols, broadcastDimKeys = false)
    val recomputed = fullJoin(factUpserts.unionByName(dimTouched), dim2,
      pkCol, fkCol, dkCol, factCols, dimCols)
    val touched = recomputed.select(col(pkCol)).unionByName(factDeletes)
    priorJ.join(touched, Seq(pkCol), "left_anti").unionByName(recomputed)
  }

  /** The delta row-selection shared by the pure algebra ([[deltaApply]],
    * which the oracled twin proves) and the table-backed step
    * ([[maintainJoin]]) — ONE copy, so the two cannot drift apart and
    * the oracle keeps vouching for what the tables run.
    * Fact side changed → the whole row re-derives from the after-image;
    * fact deletes delete; dim side changed with fact side untouched →
    * the prior row's fact columns are still current, only its dim
    * columns re-derive (unmatched rows participate: fk ∈ dimKeys with
    * a fresh dim INSERT is exactly the dangling-fk resurrection path). */
  private def deltaRows(priorJ: DataFrame, factDiff: DataFrame,
                        dimKeys: DataFrame, pkCol: String, fkCol: String,
                        dkCol: String, factCols: Seq[String],
                        broadcastDimKeys: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    val factUpserts = factDiff.filter(col("after").isNotNull)
      .select(col(pkCol) +: factCols.map(c => col(s"after.$c").as(c)): _*)
    val factDeletes = factDiff.filter(col("after").isNull).select(col(pkCol))
    val dk = dimKeys.select(col(dkCol))
    val dimTouched = priorJ
      .join(if (broadcastDimKeys) broadcast(dk) else dk,
        col(fkCol) === col(dkCol), "left_semi")
      .join(factUpserts.select(col(pkCol)), Seq(pkCol), "left_anti")
      .join(factDeletes, Seq(pkCol), "left_anti")
      .select(col(pkCol) +: factCols.map(col): _*)
    (factUpserts, factDeletes, dimTouched)
  }

  // -------------------------------------------------------------------
  // Table-backed maintenance: fact, dim, and the materialized join are
  // all PartitionedUpsert targets; the join's manifest records the
  // last-applied version of BOTH sources in its transaction map,
  // advanced atomically in the same manifest write as the data merge.
  // -------------------------------------------------------------------

  private def app(dir: String): String = PartitionedUpsert.cdfApp(dir)

  private def manifestOf(spark: SparkSession, dir: String) =
    PartitionedUpsert.manifestOrFail(spark, dir)

  /** Fact/dim column split and fk recovered from the maintained schema
    * itself (the marker column's position and name). */
  private def specOf(schema: org.apache.spark.sql.types.StructType,
                     pkCol: String): (String, Seq[String], Seq[String]) = {
    val names = schema.fieldNames.toSeq
    val mi = names.indexWhere(_.startsWith("__joined_on__"))
    require(mi >= 0, s"schema carries no __joined_on__ marker — not a " +
      s"JoinMaintain materialization: $names")
    val fk = names(mi).stripPrefix("__joined_on__")
    val factCols = names.take(mi).filterNot(_ == pkCol)
    (fk, factCols, names.drop(mi + 1))
  }

  /** Companion fk-index location — nested inside the join dir, which
    * is inert to PartitionedUpsert (its listings confine to `data/`
    * and `_manifests/`). */
  def fkIndexDir(joinDir: String): String = s"$joinDir/_fkidx"

  /** Seed the materialized join from both sources' CURRENT committed
    * states (the only O(fact ⋈ dim) step in the lifecycle), recording
    * the (fact, dim) versions it reflects — both reads pinned to the
    * versions the transaction map records (the initAggregate TOCTOU
    * rule). Returns (factVersion, dimVersion).
    * `fkIndex = true` also builds the [[FkIndex]] companion: dim-side
    * maintenance then finds rows to re-derive by point lookups instead
    * of the fk-filtered join-table scan — the hot-dim path. */
  def initJoin(spark: SparkSession, factDir: String, dimDir: String,
               joinDir: String, fkCol: String, nBuckets: Int,
               fkIndex: Boolean = false,
               maxRefs: Int = FkIndex.DefaultMaxRefs): (Long, Long) = {
    val fm = manifestOf(spark, factDir)
    val dm = manifestOf(spark, dimDir)
    val pk = fm.keyCol
    val dk = dm.keyCol
    val factCols = fm.schema.fieldNames.toSeq.filterNot(_ == pk)
    val dimCols = dm.schema.fieldNames.toSeq.filterNot(_ == dk)
    val j = fullJoin(
      PartitionedUpsert.readVersion(spark, factDir, fm.version),
      PartitionedUpsert.readVersion(spark, dimDir, dm.version),
      pk, fkCol, dk, factCols, dimCols)
    PartitionedUpsert.initWith(j, joinDir, pk, nBuckets,
      txns = Seq(app(factDir) -> fm.version, app(dimDir) -> dm.version))
    if (fkIndex)
      FkIndex.init(spark, factDir, fkIndexDir(joinDir), fkCol, nBuckets,
        maxRefs, atVersion = Some(fm.version)): Unit
    (fm.version, dm.version)
  }

  /** Read the materialization: `inner = true` filters to matched rows
    * (the INNER join view); default exposes the stored left-outer
    * shape including the marker. */
  def readJoin(spark: SparkSession, joinDir: String,
               inner: Boolean = false): DataFrame = {
    val jm = manifestOf(spark, joinDir)
    val (fk, _, _) = specOf(jm.schema, jm.keyCol)
    val j = PartitionedUpsert.read(spark, joinDir)
    if (inner) j.filter(col(markerCol(fk))).drop(markerCol(fk)) else j
  }

  /** Advance the materialized join to both sources' current versions by
    * consuming their CDFs — never re-joining. Returns ((factFrom,
    * factTo), (dimFrom, dimTo)); from == to on both means the join was
    * already current (two manifest lookups, zero data reads).
    * Idempotent: the merge advances both source cursors in the SAME
    * atomic manifest write as the data; a crash before commit leaves
    * the prior materialization readable and the step simply re-runs.
    * Concurrent maintainers (a fact-cadence sink plus a dim-cadence
    * one) resolve by retrying once from fresh manifests: the loser of
    * the publish race — or a step whose window another maintainer
    * partially applied first — recomputes against the winner's
    * cursors, where the remaining window shrinks to what is genuinely
    * unapplied. */
  def maintainJoin(spark: SparkSession, factDir: String, dimDir: String,
                   joinDir: String,
                   toFact: Option[Long] = None,
                   toDim: Option[Long] = None): ((Long, Long), (Long, Long)) =
    try attemptMaintain(spark, factDir, dimDir, joinDir, toFact, toDim)
    catch {
      case _: java.util.ConcurrentModificationException =>
        attemptMaintain(spark, factDir, dimDir, joinDir, toFact, toDim)
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("is already applied") =>
        // another maintainer advanced one of OUR cursors between this
        // step's manifest read and its merge — re-resolve and redo the
        // (now smaller) remaining window
        attemptMaintain(spark, factDir, dimDir, joinDir, toFact, toDim)
    }

  private def attemptMaintain(spark: SparkSession, factDir: String,
                              dimDir: String, joinDir: String,
                              toFact: Option[Long], toDim: Option[Long])
      : ((Long, Long), (Long, Long)) = {
    val jm = manifestOf(spark, joinDir)
    val fm = manifestOf(spark, factDir)
    val dm = manifestOf(spark, dimDir)
    val fF = jm.txns.getOrElse(app(factDir), missing(joinDir, factDir))
    val fD = jm.txns.getOrElse(app(dimDir), missing(joinDir, dimDir))
    // explicit pins enable coordinated DAG rounds (DagRead): every
    // sibling target steps to the SAME source version
    val (tF, tD) = (toFact.getOrElse(fm.version), toDim.getOrElse(dm.version))
    if (tF <= fF && tD <= fD) return ((fF, fF), (fD, fD))
    val pk = jm.keyCol
    val dk = dm.keyCol
    val (fk, factCols, dimCols) = specOf(jm.schema, pk)
    val cursors =
      (if (tF > fF) Seq(app(factDir) -> tF) else Nil) ++
        (if (tD > fD) Seq(app(dimDir) -> tD) else Nil)

    // pinned: the touched-bucket collects inside readForKeys/merge and
    // the change-log build must see the same diff rows
    val factDiff = (if (tF > fF)
      PartitionedUpsert.changesBetweenImages(spark, factDir, fF, tF)
    else {
      val empty = PartitionedUpsert.read(spark, joinDir)
        .select((pk +: factCols).map(col): _*).limit(0)
      AggMaintain.diffImages(empty, empty, Seq(pk), factCols)
    }).persist()
    val dimKeys = (if (tD > fD)
      PartitionedUpsert.changesBetween(spark, dimDir, fD, tD)
        .select(col(dk)).distinct()
    else PartitionedUpsert.read(spark, dimDir).select(col(dk)).limit(0))
      .persist()
    try {
      if (factDiff.isEmpty && dimKeys.isEmpty) {
        // zero-row-change windows (source compact/rebucket) must still
        // advance the cursors atomically or every later call re-diffs
        // the rewritten buckets forever
        PartitionedUpsert.recordTxns(spark, joinDir, cursors)
        return ((fF, tF), (fD, tD))
      }
      // the one scan-shaped read (dimTouched: join rows whose fk hits
      // a changed dim key — narrow fk-filtered scan, dim keys
      // broadcast) lives in deltaRows, SHARED with the oracled
      // algebra. On a fact-only window the dim key set is empty, so
      // the scan is replaced by an empty relation outright — the
      // COMMON trigger path (fact-cadence sinks) must not pay a
      // join-table scan to semi-join against nothing (measured: the
      // scan was the bulk of the fact-step cost in the 10x smoke).
      // With the FkIndex companion, the scan shrinks to point
      // lookups: index rows for the changed dim keys → their pk lists
      // → bucket-pruned join reads; only OVERFLOWED (hub) fks still
      // scan, restricted to just those keys. The frame is a SUPERSET
      // of the rows deltaRows' semi-join keeps, so the index only
      // prunes — semantics stay with the one shared deltaRows copy.
      val priorForDim =
        if (tD <= fD) PartitionedUpsert.read(spark, joinDir).limit(0)
        else {
          val idxDir = fkIndexDir(joinDir)
          if (PartitionedUpsert.currentManifest(spark, idxDir).isEmpty)
            PartitionedUpsert.read(spark, joinDir)
          else {
            // catch the index up to EXACTLY this step's fact target —
            // pinning keeps a concurrent fact commit from advancing
            // the index past the window being joined
            val (idxFrom, _) =
              FkIndex.maintain(spark, factDir, idxDir, Some(tF))
            if (idxFrom > tF)
              // another maintainer already advanced the index PAST
              // this step's fact window: a pk retargeted after tF is
              // gone from its old fk's row, so the index cannot
              // vouch for this older window — scan instead (rare;
              // only a concurrent-maintainer interleaving gets here)
              PartitionedUpsert.read(spark, joinDir)
            else {
              val (pkKeys, hubFks) = FkIndex.lookup(spark, idxDir,
                dimKeys.select(col(dk).as(fk)))
              val point = PartitionedUpsert.readForKeys(spark, joinDir,
                pkKeys.select(col("__pk").as(pk)), pk)
              if (hubFks.isEmpty) point
              else {
                val hubs =
                  broadcast(hubFks.select(col(fk).as("__hubfk")))
                // a prior row whose fk is a hub fk can surface via
                // BOTH the point read (bucket superset) and the hub
                // scan — exclude it from the point side so the union
                // never double-recomputes a row
                point.join(hubs, col(fk) === col("__hubfk"), "left_anti")
                  .unionByName(PartitionedUpsert.read(spark, joinDir)
                    .join(hubs, col(fk) === col("__hubfk"), "left_semi"))
              }
            }
          }
        }
      val (factUpserts, factDeletes, dimTouched) = deltaRows(
        priorForDim, factDiff, dimKeys,
        pk, fk, dk, factCols, broadcastDimKeys = true)
      val toRecompute = factUpserts.unionByName(dimTouched).persist()
      try {
        // dim side of the recompute: point lookup of exactly the fks
        // the recomputed rows reference — O(touched), never O(dim)
        val dimSlice = PartitionedUpsert.readForKeys(spark, dimDir,
          toRecompute.select(col(fk).as(dk)).filter(col(dk).isNotNull), dk)
        val recomputed = fullJoin(toRecompute, dimSlice, pk, fk, dk,
          factCols, dimCols)
        val valueCols = factCols ++ (markerCol(fk) +: dimCols)
        val changeLog = recomputed
          .withColumn("__op", lit("u"))
          .unionByName(factDeletes.withColumn("__op", lit("d")),
            allowMissingColumns = true)
          // both cursors are nondecreasing and ≥ one strictly advances
          // per step, so the sum is a strictly increasing step lsn
          .withColumn("__lsn", lit(tF + tD))
        val touched = PartitionedUpsert.mergeWith(spark, joinDir, changeLog,
          pk, "__lsn", "__op", valueCols, jm.nBuckets, txns = cursors)
        // a non-empty window can still net an EMPTY change log (a dim
        // change whose key no join row references) — mergeWith's
        // empty-batch fast path then skips the manifest write, so the
        // cursors must advance here or every later call re-diffs the
        // same window forever (recordTxns no-ops if a racing step
        // already advanced them)
        if (touched.isEmpty)
          PartitionedUpsert.recordTxns(spark, joinDir, cursors)
        ((fF, tF), (fD, tD))
      } finally { toRecompute.unpersist(); () }
    } finally { factDiff.unpersist(); dimKeys.unpersist(); () }
  }

  private def missing(joinDir: String, srcDir: String): Nothing =
    throw new IllegalStateException(
      s"$joinDir does not maintain a join of $srcDir — initJoin it first " +
        s"(txn key ${app(srcDir)} absent)")
}
