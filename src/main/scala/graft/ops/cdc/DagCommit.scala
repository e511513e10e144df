package graft.ops.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single ATOMIC commit across sibling derived targets — the read
  * path that closes the gap [[DagRead]] documents: a reader that does
  * not reconstruct cursor histories can still observe the replica at
  * source v2 and the aggregate at source v1, because each target
  * publishes its own manifest on its own cadence.
  *
  * The mechanism is the catalog pattern (one atomically-swapped
  * pointer making a multi-table state visible as a unit — what
  * lakehouse catalogs do for multi-table transactions): a DAG-level
  * manifest pins every member target to an explicit table version, and
  * the [[AtomicPublish]] no-overwrite rename of that ONE file is the
  * commit point for the whole round. Maintenance hops still advance
  * per-target manifests exactly as before (each hop transactional on
  * its own); none of those intermediate states is visible to a
  * [[read]]/[[readTarget]] consumer until the pointer swap lands. A
  * crash at ANY inter-target seam therefore leaves readers on the
  * previous round's tuple — not a mixed state — and the healed round's
  * single publish moves them forward as a unit.
  *
  * [[advanceAligned]] is the coordinated form: it refuses to pin a
  * tuple whose members record DIFFERENT source cursors under the
  * round's txn key, so a half-completed round (the crash seam) cannot
  * be published even by an operator error. [[advance]] is the
  * uncoordinated form for single-writer DAGs that want atomic
  * visibility of "whatever the targets hold now".
  *
  * Retention contract (stated, like every time-travel consumer's): a
  * pinned table version must outlive the pin — each target's vacuum
  * `keepVersions` has to cover at least the pointer cadence, and
  * [[vacuumDag]] bounds the pointer history itself the same way.
  */
object DagCommit {

  /** One member's pin: its table directory and the committed table
    * version the DAG points at. */
  final case class Pin(dir: String, version: Long)

  final case class DagManifest(version: Long, pins: Map[String, Pin])

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pinPath(dagDir: String, v: Long): Path =
    new Path(s"$dagDir/_dag/v%020d.dag".format(v))

  private def body(m: DagManifest): String =
    m.pins.toSeq.sortBy(_._1)
      .map { case (n, p) => s"$n\t${p.dir}\t${p.version}" }.mkString("\n")

  /** Newest committed DAG manifest, or None before [[init]]. */
  def currentDag(spark: SparkSession, dagDir: String): Option[DagManifest] = {
    val fs = fsOf(spark, dagDir)
    val mdir = new Path(s"$dagDir/_dag")
    if (!fs.exists(mdir)) return None
    val versions = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".dag"))
      .map(n => n.stripPrefix("v").stripSuffix(".dag").toLong)
    if (versions.isEmpty) None
    else Some {
      val v = versions.max
      val pins = AtomicPublish.readText(fs, pinPath(dagDir, v))
        .split('\n').filter(_.nonEmpty).map { l =>
          val Array(n, d, tv) = l.split('\t')
          n -> Pin(d, tv.toLong)
        }.toMap
      DagManifest(v, pins)
    }
  }

  private def dagOrFail(spark: SparkSession, dagDir: String): DagManifest =
    currentDag(spark, dagDir).getOrElse(throw new IllegalStateException(
      s"$dagDir is not an initialized DAG pointer — call DagCommit.init"))

  private[cdc] def publish(spark: SparkSession, dagDir: String,
                           m: DagManifest): DagManifest = {
    AtomicPublish.publishNoOverwrite(fsOf(spark, dagDir),
      pinPath(dagDir, m.version), body(m))
    m
  }

  /** Register the member targets and pin each at its CURRENT committed
    * version (all must be initialized upsert targets). Commits DAG v1. */
  def init(spark: SparkSession, dagDir: String,
           targets: Map[String, String]): DagManifest = {
    require(targets.nonEmpty, "a DAG pointer needs at least one target")
    if (currentDag(spark, dagDir).nonEmpty)
      throw new IllegalStateException(s"$dagDir already holds a DAG pointer")
    publish(spark, dagDir, DagManifest(1L, targets.map { case (n, d) =>
      n -> Pin(d, PartitionedUpsert.manifestOrFail(spark, d).version)
    }))
  }

  /** Atomically re-pin every member at its current committed version.
    * The single rename IS the commit: before it, readers see the old
    * tuple whole; after it, the new tuple whole. Racing advances
    * collide on the versioned pointer file (ConcurrentModification —
    * the manifest-publish contract). */
  def advance(spark: SparkSession, dagDir: String): DagManifest = {
    val cur = dagOrFail(spark, dagDir)
    publish(spark, dagDir, DagManifest(cur.version + 1,
      cur.pins.map { case (n, p) =>
        n -> Pin(p.dir, PartitionedUpsert.manifestOrFail(spark, p.dir).version)
      }))
  }

  /** [[advance]] that refuses inconsistent tuples: every member's
    * current manifest must record `point` under `txnKey` (the source
    * cursor a coordinated round pins — [[DagRead.alignedRound]]'s
    * return value). A member that lagged (the crash-between-hops seam)
    * fails the whole publish loudly, so a half round can never become
    * visible. Verification and pinning read each member's manifest
    * ONCE, so the published tuple is exactly the verified one. */
  def advanceAligned(spark: SparkSession, dagDir: String, txnKey: String,
                     point: Long): DagManifest = {
    val cur = dagOrFail(spark, dagDir)
    val pins = cur.pins.map { case (n, p) =>
      val m = PartitionedUpsert.manifestOrFail(spark, p.dir)
      val recorded = m.txns.get(txnKey)
      if (!recorded.contains(point))
        throw new IllegalStateException(
          s"target '$n' (${p.dir}) records $txnKey=" +
            s"${recorded.map(_.toString).getOrElse("<absent>")}, not the " +
            s"round's point $point — the round has not completed there; " +
            s"refusing to publish a mixed tuple")
      n -> Pin(p.dir, m.version)
    }
    publish(spark, dagDir, DagManifest(cur.version + 1, pins))
  }

  /** The whole DAG at its pinned tuple — one consistent multi-table
    * snapshot, every member time-travel-read at its pinned version. */
  def read(spark: SparkSession, dagDir: String)
      : (DagManifest, Map[String, DataFrame]) = {
    val m = dagOrFail(spark, dagDir)
    (m, m.pins.map { case (n, p) =>
      n -> PartitionedUpsert.readVersion(spark, p.dir, p.version)
    })
  }

  /** One member at its pinned version. */
  def readTarget(spark: SparkSession, dagDir: String, name: String): DataFrame = {
    val m = dagOrFail(spark, dagDir)
    val p = m.pins.getOrElse(name, throw new IllegalArgumentException(
      s"DAG at $dagDir has no target '$name' " +
        s"(members: ${m.pins.keys.toSeq.sorted.mkString(", ")})"))
    PartitionedUpsert.readVersion(spark, p.dir, p.version)
  }

  /** Vacuum every member table WITHOUT breaking any retained pin —
    * the retention contract this module's scaladoc states, made
    * operational instead of left to the operator: for each member,
    * `keepManifests` is widened to cover the OLDEST table version any
    * retained DAG pointer pins (current.version − oldestPin + 1), so
    * a [[read]] through any retained pointer stays resolvable after
    * the sweep. A raw `PartitionedUpsert.vacuum(keep = 1)` on a member
    * is exactly the operator error that strands a pointer —
    * DagCommitSpec proves both directions. */
  def vacuumMembers(spark: SparkSession, dagDir: String,
                    keepVersions: Int = 2,
                    minStagingAgeMs: Long = 3600000L): Unit = {
    val fs = fsOf(spark, dagDir)
    val mdir = new Path(s"$dagDir/_dag")
    if (!fs.exists(mdir)) return
    val retained = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".dag"))
      .map(n => n.stripPrefix("v").stripSuffix(".dag").toLong)
      .sorted.takeRight(keepVersions)
    val pinned = retained.flatMap { v =>
      AtomicPublish.readText(fs, pinPath(dagDir, v))
        .split('\n').filter(_.nonEmpty).map { l =>
          val Array(_, d, tv) = l.split('\t'); d -> tv.toLong
        }
    }.groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).min }
    pinned.foreach { case (dir, oldestPin) =>
      val cur = PartitionedUpsert.manifestOrFail(spark, dir).version
      PartitionedUpsert.vacuum(spark, dir,
        keepManifests = math.max(keepVersions.toLong,
          cur - oldestPin + 1).toInt,
        minStagingAgeMs = minStagingAgeMs)
    }
  }

  /** Bound the pointer history: keep the newest `keepVersions` DAG
    * manifests (current + enough predecessors for in-flight readers),
    * delete older ones. Mirrors the table vacuum's manifest guard. */
  def vacuumDag(spark: SparkSession, dagDir: String,
                keepVersions: Int = 2): Unit = {
    require(keepVersions >= 1, "must keep at least the current pointer")
    val fs = fsOf(spark, dagDir)
    val mdir = new Path(s"$dagDir/_dag")
    if (!fs.exists(mdir)) return
    fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".dag"))
      .map(n => n.stripPrefix("v").stripSuffix(".dag").toLong)
      .sorted.dropRight(keepVersions)
      .foreach(v => fs.delete(pinPath(dagDir, v), false))
  }
}
