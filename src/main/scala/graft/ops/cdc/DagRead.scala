package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-target read consistency for the derived-table DAG.
  *
  * Every derived target (replica, aggregate, join, SCD2 pair,
  * fk-index) heals per-hop through its own manifest transactions —
  * but sibling targets advance independently, so a reader joining two
  * derived tables can observe them at DIFFERENT source versions. This
  * module closes that gap without a cross-table commit protocol, using
  * what the manifests already record:
  *
  *  - every committed manifest of a target carries, in its txn map,
  *    the source cursor that state reflects (`cdf:<sourceDir>` for CDF
  *    consumers; the sink appId for batch-driven pairs like SCD2
  *    history+open);
  *  - manifests are immutable and time-travel readable, so a target's
  *    FULL cursor history — (source version → table version) — is
  *    recoverable by walking retained manifests;
  *  - therefore a consistent cross-target read point is simply the
  *    largest source version present in EVERY sibling's history, and
  *    reading each sibling at its manifest for that point yields a
  *    snapshot in which all targets reflect the same source state.
  *
  * A crash at ANY inter-target seam leaves the previous aligned point
  * intact in every history (the advanced targets keep their old
  * manifests), so a consistent read EXISTS AT ALL TIMES — the window
  * only moves forward when the last sibling lands. [[alignedRound]]
  * makes the points dense: it pins every maintenance step of a round
  * to one source version, so siblings share cursor values by
  * construction rather than luck.
  *
  * This module RECONSTRUCTS consistency from cursor histories — the
  * right tool for ad-hoc readers over targets that advance on
  * independent cadences. When the DAG is coordinated (one round
  * advances every sibling), [[DagCommit]] is the stronger companion:
  * a single atomically-swapped pointer manifest makes the whole round
  * visible as ONE commit, so consumers need no history walk and a
  * non-reconstructing reader cannot observe mixed source versions.
  *
  * Honest boundary: the consistency window is the manifest RETENTION
  * window — vacuuming a target's old versions ages aligned points out
  * exactly like any other time-travel read. And a target whose
  * maintenance SKIPS versions (stepping 5→12 directly) records no
  * point inside the gap; alignedRound exists precisely so coordinated
  * DAGs do not produce such gaps.
  */
object DagRead {

  /** (cursor value → table version) for one target under `txnKey`:
    * for each retained manifest, the value its txn map records; several
    * manifests with the SAME cursor value (compactions, sibling-cursor
    * advances, zero-change windows) collapse to the LATEST table
    * version — equivalent states as far as this cursor is concerned,
    * and later compactions are the better-laid-out read. */
  def cursorHistory(spark: SparkSession, dir: String,
                    txnKey: String): Map[Long, Long] =
    PartitionedUpsert.manifests(spark, dir).flatMap { m =>
      m.txns.get(txnKey).map(cv => cv -> m.version)
    }.groupBy(_._1).map { case (cv, vs) => cv -> vs.map(_._2).max }

  /** The newest cursor value present in EVERY target's retained
    * history — the latest point at which all of them reflect the same
    * source state. None when a target has no retained point in common
    * (e.g. never initialized, or retention already aged the overlap
    * out). */
  def consistentPoint(spark: SparkSession, dirs: Seq[String],
                      txnKey: String): Option[Long] = {
    require(dirs.nonEmpty, "consistentPoint needs at least one target")
    dirs.map(d => cursorHistory(spark, d, txnKey).keySet)
      .reduce(_ intersect _).maxOption
  }

  /** Read one target AS OF a cursor point (its committed state whose
    * txn map records exactly `point` under `txnKey`). Loud on a
    * missing point — silently reading a nearby state would defeat the
    * consistency contract. */
  def readAt(spark: SparkSession, dir: String, txnKey: String,
             point: Long): DataFrame = {
    val hist = cursorHistory(spark, dir, txnKey)
    val v = hist.getOrElse(point,
      throw new IllegalArgumentException(
        s"$dir has no retained state at $txnKey=$point " +
          s"(available: ${hist.keys.toSeq.sorted.mkString(", ")})"))
    PartitionedUpsert.readVersion(spark, dir, v)
  }

  /** The consistent snapshot: the newest common point plus every
    * target read at it. None iff no common point is retained. */
  def readConsistent(spark: SparkSession, dirs: Seq[String], txnKey: String)
      : Option[(Long, Map[String, DataFrame])] = {
    require(dirs.nonEmpty, "readConsistent needs at least one target")
    // one history walk per target, shared between finding the point
    // and pinning each read to it
    val hists = dirs.map(d => d -> cursorHistory(spark, d, txnKey)).toMap
    hists.values.map(_.keySet).reduce(_ intersect _).maxOption.map { p =>
      p -> dirs.map(d =>
        d -> PartitionedUpsert.readVersion(spark, d, hists(d)(p))).toMap
    }
  }

  /** One coordinated maintenance round over a source's derived
    * targets: resolve the source version ONCE, pin every step to it,
    * return it. After the round completes, that version is a common
    * cursor point across all targets; if the round crashes anywhere,
    * the previous round's point is still retained everywhere — the
    * crash-at-every-seam guarantee DagReadSpec walks. `joins` are
    * (dimDir, joinDir) pairs whose FACT is the source (the dim cursor
    * rides to the dim's current version; fact-consistency is what the
    * shared point certifies). */
  def alignedRound(spark: SparkSession, sourceDir: String,
                   aggDirs: Seq[String] = Seq.empty,
                   joins: Seq[(String, String)] = Seq.empty): Long = {
    val sv = PartitionedUpsert.manifestOrFail(spark, sourceDir).version
    aggDirs.foreach { aggDir =>
      AggMaintain.maintainAggregate(spark, sourceDir, aggDir, Some(sv)): Unit
    }
    joins.foreach { case (dimDir, joinDir) =>
      JoinMaintain.maintainJoin(spark, sourceDir, dimDir, joinDir,
        toFact = Some(sv)): Unit
    }
    sv
  }
}
