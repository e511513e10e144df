package graft.ops.cdc

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-bucket Bloom-filter sidecar over a SECONDARY column of a
  * [[PartitionedUpsert]] table — point lookups on a column the table
  * is NOT bucketed by. Bucket routing only prunes lookups on the key
  * column ([[PartitionedUpsert.readForKeys]]); the manifest's min/max
  * stats only prune the key's sparse ranges ([[PartitionedUpsert.
  * readKeyRange]]). For "find rows where user_id = X" on a table
  * keyed by event_id, every bucket is a candidate — unless something
  * remembers, per bucket, which secondary values it contains. This is
  * that something: one Bloom filter per bucket (Spark's public
  * `org.apache.spark.util.sketch.BloomFilter`, fed xxhash64 of the
  * column), small enough to sit next to the manifests and consult on
  * the driver before any file is opened.
  *
  * Same companion-table contract as [[FkIndex]]: the index is DERIVED
  * state stamped with the exact table version it reflects, and it
  * only ever PRUNES — correctness never depends on it being fresh.
  * A lookup on a table that moved past the indexed version includes
  * every bucket the manifest diff says changed since (conservative),
  * consults blooms only for provably-unchanged buckets, and filters
  * exactly afterwards; a Bloom false positive costs one extra bucket
  * read, never a wrong row. [[refresh]] rebuilds ONLY changed buckets
  * (manifest diff — the changesBetween pruning rule) and re-uses the
  * sidecar bytes of untouched ones, so maintenance is O(changed
  * data) like every other derived table here.
  *
  * Scale shape: build is two distributed passes (per-bucket distinct
  * counts to size the filters, then a bucket-grouped stream through
  * `mapGroups` that feeds each bucket's hashes into its filter
  * executor-side). Driver state is nBuckets filter blobs at publish
  * time — ~1.2 MB per million distinct values at fpp 0.01, the same
  * bounded-sidecar class as the IVF codebook, stated here because it
  * sizes the driver, not an executor. Publish is crash-safe: sidecar
  * files land in a temp dir, `_DONE` is written LAST, and the rename
  * to `v{version}` is the commit point — readers ignore any version
  * dir without `_DONE`.
  */
object BloomIndex {

  /** False-positive probability the filters are sized for. */
  val DefaultFpp = 0.01

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(idxDir: String, v: Long) =
    new Path(s"$idxDir/v%020d".format(v))

  private def bloomPath(idxDir: String, v: Long, bucket: Long) =
    new Path(versionDir(idxDir, v), s"bucket-$bucket.bloom")

  /** Newest table version with a COMPLETE (_DONE-marked) sidecar set,
    * if any. */
  def indexedVersion(spark: SparkSession, idxDir: String): Option[Long] = {
    val fs = fsOf(spark, idxDir)
    val base = new Path(idxDir)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(_.getPath.getName.stripPrefix("v").toLong)
      .filter(v => fs.exists(new Path(versionDir(idxDir, v), "_DONE")))
      .sorted.lastOption
  }

  /** The indexed column AND fpp ride the _DONE marker — lookups
    * cannot silently probe a different column than was indexed, and
    * refresh cannot silently rebuild hot buckets at a different
    * false-positive rate than the index was configured with. */
  private def doneMeta(spark: SparkSession, idxDir: String,
                       v: Long): (String, Double) = {
    val fs = fsOf(spark, idxDir)
    val in = fs.open(new Path(versionDir(idxDir, v), "_DONE"))
    val lines = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
    lines.split("\n") match {
      case Array(c, f) => (c.trim, f.trim.toDouble)
      case Array(c) => (c.trim, DefaultFpp) // pre-fpp marker era
      case _ => sys.error(s"malformed _DONE at $idxDir v$v")
    }
  }

  private def doneColumn(spark: SparkSession, idxDir: String,
                         v: Long): String = doneMeta(spark, idxDir, v)._1

  /** Build the index for the table's CURRENT version. Returns the
    * version indexed. Idempotent: an existing complete sidecar set
    * for that version is left in place. */
  def build(spark: SparkSession, tableDir: String, idxDir: String,
            column: String, fpp: Double = DefaultFpp): Long = {
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    publish(spark, tableDir, idxDir, m, column, fpp,
      rebuild = m.buckets.keySet, reuseFrom = None)
    m.version
  }

  /** Advance the index to the table's current version, rebuilding
    * ONLY buckets whose data changed since the indexed version and
    * re-using the sidecar bytes of untouched ones. Falls back to a
    * full build when no prior index exists or the indexed version's
    * manifest was vacuumed (the diff base is gone — conservative).
    * Returns (rebuilt, reused) bucket counts. */
  def refresh(spark: SparkSession, tableDir: String,
              idxDir: String): (Int, Int) = {
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    indexedVersion(spark, idxDir) match {
      case Some(v) if v == m.version => (0, m.buckets.size)
      case Some(v) =>
        val (column, fpp) = doneMeta(spark, idxDir, v)
        scala.util.Try(
            PartitionedUpsert.manifestAt(spark, tableDir, v)) match {
          case scala.util.Success(old) =>
            val changed = (old.buckets.keySet ++ m.buckets.keySet)
              .filter(b => old.buckets.get(b) != m.buckets.get(b))
            publish(spark, tableDir, idxDir, m, column, fpp,
              rebuild = changed, reuseFrom = Some(v))
            val rb = changed.count(m.buckets.contains)
            (rb, m.buckets.size - rb)
          case scala.util.Failure(_) =>
            publish(spark, tableDir, idxDir, m, column, fpp,
              rebuild = m.buckets.keySet, reuseFrom = None)
            (m.buckets.size, 0)
        }
      case None =>
        sys.error(s"refresh: no complete index at $idxDir — call build first")
    }
  }

  /** The bucket ids a lookup for `values` must read: buckets changed
    * since the indexed version (or all, if no index), plus unchanged
    * buckets whose bloom MIGHT contain at least one probe value.
    * Exposed separately so callers (and specs) can observe pruning. */
  def candidateBuckets(spark: SparkSession, tableDir: String,
                       idxDir: String, column: String,
                       values: Seq[Any]): Seq[Long] =
    candidateBucketsFor(spark, tableDir, idxDir, column, values,
      PartitionedUpsert.manifestOrFail(spark, tableDir))

  /** [[candidateBuckets]] against a caller-resolved manifest —
    * [[lookup]] passes the SAME manifest it will read with, so a
    * rebucket committing between two independent manifest reads can
    * never make the candidate ids and the read layout disagree (the
    * silent-row-loss race a double-resolve would open). */
  private def candidateBucketsFor(spark: SparkSession, tableDir: String,
                                  idxDir: String, column: String,
                                  values: Seq[Any],
                                  m: PartitionedUpsert.Manifest): Seq[Long] = {
    require(values.nonEmpty && !values.contains(null),
      "probe values must be non-empty and non-null (IS NULL never " +
        "matches an isin lookup; index nulls are not probed)")
    indexedVersion(spark, idxDir) match {
      case None => m.buckets.keySet.toSeq.sorted
      case Some(v) =>
        val indexedCol = doneColumn(spark, idxDir, v)
        require(indexedCol == column,
          s"index at $idxDir covers column '$indexedCol', not '$column'")
        // probe hashes computed by the SAME engine expression that fed
        // the filters — a driver-side reimplementation of xxhash64
        // would be a silent-divergence hazard
        val probes = {
          import spark.implicits._
          val vdf = values.map(_.toString).toDF("__raw")
            .select(col("__raw").cast(m.schema(column).dataType).as("__v"))
          vdf.select(xxhash64(col("__v")).as("__h"))
            .collect().map(_.getLong(0))
        }
        val stale: Set[Long] =
          if (v == m.version) Set.empty
          else scala.util.Try(
              PartitionedUpsert.manifestAt(spark, tableDir, v)) match {
            case scala.util.Success(old) =>
              (old.buckets.keySet ++ m.buckets.keySet)
                .filter(b => old.buckets.get(b) != m.buckets.get(b))
            case scala.util.Failure(_) => m.buckets.keySet // diff base gone
          }
        val fs = fsOf(spark, idxDir)
        m.buckets.keySet.toSeq.sorted.filter { b =>
          if (stale(b)) true
          else {
            val p = bloomPath(idxDir, v, b)
            if (!fs.exists(p)) true // bucket newer than the index era
            else {
              val in = fs.open(p)
              val bf = try BloomFilter.readFrom(in) finally in.close()
              probes.exists(bf.mightContainLong)
            }
          }
        }
    }
  }

  /** Rows where `column` ∈ `values`, reading ONLY candidate buckets.
    * Exact: the isin filter runs after pruning, so staleness and Bloom
    * false positives cost reads, never wrong rows. */
  def lookup(spark: SparkSession, tableDir: String, idxDir: String,
             column: String, values: Seq[Any]): DataFrame = {
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    val cand = candidateBucketsFor(spark, tableDir, idxDir, column, values, m)
    PartitionedUpsert.readBuckets(spark, tableDir, m, cand)
      .filter(col(column).isin(values: _*))
  }

  /** Two passes: size each bucket's filter from its distinct-hash
    * count, then stream each bucket's hashes through its filter in
    * ONE `mapGroups` task per bucket (executor-side; only the
    * serialized blobs come back). */
  private def buildBlooms(spark: SparkSession, tableDir: String,
                          m: PartitionedUpsert.Manifest, column: String,
                          fpp: Double, buckets: Set[Long])
      : Map[Long, Array[Byte]] = {
    import spark.implicits._
    if (buckets.isEmpty) return Map.empty
    val rows = PartitionedUpsert
      .readBuckets(spark, tableDir, m, buckets.toSeq.sorted.filter(m.buckets.contains))
      .select(
        PartitionedUpsert.routeFor(m, col(m.keyCol)).as("__b"),
        xxhash64(col(column)).as("__h"))
    val sizes = rows.groupBy($"__b")
      .agg(approx_count_distinct($"__h", 0.02).as("__n"))
      .as[(Long, Long)].collect().toMap
    val bSizes = spark.sparkContext.broadcast(sizes)
    rows.as[(Long, Long)].groupByKey(_._1)
      .mapGroups { (b, it) =>
        // approx sizing + 20% headroom keeps fpp near target without
        // an exact (shuffle-heavy) distinct pass
        val n = math.max(16L, bSizes.value.getOrElse(b, 16L) * 12 / 10)
        val bf = BloomFilter.create(n, fpp)
        it.foreach(r => bf.putLong(r._2))
        val bos = new ByteArrayOutputStream()
        bf.writeTo(bos)
        (b, bos.toByteArray)
      }
      .collect().toMap
  }

  /** Write sidecars for `rebuild` buckets (fresh) and every other
    * bucket of `m` (bytes copied from the `reuseFrom` era), then
    * commit: `_DONE` last inside a temp dir, rename as the publish
    * point. */
  private def publish(spark: SparkSession, tableDir: String,
                      idxDir: String, m: PartitionedUpsert.Manifest,
                      column: String, fpp: Double,
                      rebuild: Set[Long], reuseFrom: Option[Long]): Unit = {
    val fs = fsOf(spark, idxDir)
    val target = versionDir(idxDir, m.version)
    if (fs.exists(new Path(target, "_DONE"))) return // idempotent
    // a version dir WITHOUT _DONE is a torn publish (crash between
    // rename and nothing — _DONE is written before the rename, so the
    // only way to see this is an interrupted manual copy or a foreign
    // writer): garbage, safe to clear — _DONE is the commit point
    if (fs.exists(target)) fs.delete(target, true)
    val fresh = buildBlooms(spark, tableDir, m, column, fpp,
      rebuild.filter(m.buckets.contains))
    val tmp = new Path(s"$idxDir/.tmp-v${m.version}-${System.nanoTime()}")
    fs.mkdirs(tmp)
    m.buckets.keySet.toSeq.sorted.foreach { b =>
      val out = new Path(tmp, s"bucket-$b.bloom")
      fresh.get(b) match {
        case Some(bytes) =>
          val os = fs.create(out, true)
          try os.write(bytes) finally os.close()
        case None =>
          val src = bloomPath(idxDir, reuseFrom.getOrElse(
            sys.error(s"bucket $b not rebuilt and no reuse era")), b)
          val in = fs.open(src)
          val os = fs.create(out, true)
          try {
            val buf = new Array[Byte](64 * 1024)
            Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
              .foreach(n => if (n > 0) os.write(buf, 0, n))
          } finally { in.close(); os.close() }
      }
    }
    val done = fs.create(new Path(tmp, "_DONE"), true)
    try done.write(s"$column\n$fpp".getBytes("UTF-8")) finally done.close()
    // Hadoop's LOCAL FileSystem rename onto an existing destination
    // directory does not fail — it moves the source UNDER it and
    // returns true, which would nest this publisher's stale .tmp dir
    // inside the winner's committed version dir where the root-level
    // vacuum sweep never finds it. So: target existence immediately
    // before the rename IS the lost race, and the rename's outcome is
    // verified by checking the nested path afterwards (covers the
    // exists→rename window against a concurrent publisher).
    val renamed = !fs.exists(target) && fs.rename(tmp, target)
    val nested = new Path(target, tmp.getName)
    if (fs.exists(nested)) fs.delete(nested, true) // nested = we lost mid-window
    if (!renamed || fs.exists(tmp)) {
      // lost a publish race: someone else committed this version
      fs.delete(tmp, true)
      if (!fs.exists(new Path(target, "_DONE")))
        sys.error(s"publish of $target failed and no winner exists")
    }
    vacuumIndex(spark, idxDir)
  }

  /** Reclaim superseded sidecar generations — without this a
    * per-trigger streaming refresh grows the index directory by one
    * full sidecar set per trigger, forever. Keeps the newest
    * `keepVersions` COMPLETE versions (current + one predecessor by
    * default: enough for any reader that resolved the index just
    * before a publish), deletes older ones, and clears torn `.tmp-*`
    * dirs past an age guard (a concurrent publisher's in-flight tmp
    * is younger than the guard — same rule as the table vacuum's
    * in-flight staging protection). Runs after every publish, so the
    * index is self-maintaining; callable directly for a tighter keep. */
  def vacuumIndex(spark: SparkSession, idxDir: String,
                  keepVersions: Int = 2,
                  tmpAgeMs: Long = 60 * 60 * 1000L): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val fs = fsOf(spark, idxDir)
    val base = new Path(idxDir)
    if (!fs.exists(base)) return
    val entries = fs.listStatus(base).toSeq
    val complete = entries
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(s => s.getPath.getName.stripPrefix("v").toLong)
      .filter(v => fs.exists(new Path(versionDir(idxDir, v), "_DONE")))
      .sorted
    complete.dropRight(keepVersions)
      .foreach(v => fs.delete(versionDir(idxDir, v), true))
    val cutoff = System.currentTimeMillis() - tmpAgeMs
    entries
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-") &&
        s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
    // belt-and-suspenders for the nested-rename hazard (local FS
    // rename into an existing version dir): sweep .tmp-* one level
    // INSIDE committed version dirs too, same age guard. Re-check
    // existence — the retention step above just deleted the oldest
    // version dirs out of this same pre-deletion listing, and
    // listStatus on a vanished dir throws rather than returning empty
    entries
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v") &&
        fs.exists(s.getPath))
      .flatMap(s => fs.listStatus(s.getPath).toSeq)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-") &&
        s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
  }
}
