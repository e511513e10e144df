package graft.ops.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.cdc.AtomicPublish

/** Persisted, incrementally-maintained IVF index. At 100 TB the index
  * IS the asset: [[Knn.ivfCentroids]] alone recomputes k-means per job
  * and throws the assignments away — this stores both, so vectors are
  * assigned ONCE and every later search pays only a pruned read.
  *
  * Layout (same manifest-committed pattern as the upsert table —
  * [[AtomicPublish]] is the shared commit primitive):
  *
  *   dir/_manifests/v<N>.manifest   codebook + data-path list, atomic
  *   dir/data/<staging>/cid=<i>/    assignments PARTITIONED BY CENTROID
  *
  * Partitioning by centroid id is the point: a search probing `nprobe`
  * centroids reads ONLY those cid directories — the inverted-list read
  * pattern of every IVF implementation, expressed as manifest-driven
  * path pruning. Per operation:
  *
  *  - [[build]]: train codebook (Lloyd's — bounded driver state), assign
  *    every vector to its nearest centroid, write by cid, commit v1.
  *  - [[append]]: ASSIGN-ONLY — new vectors get one broadcast-codebook
  *    argmax and land in a fresh staging dir; the manifest's new version
  *    reuses every existing file. O(batch), no retrain, no rewrite.
  *  - [[search]]: assign queries to their nprobe nearest centroids
  *    (broadcast codebook), read only the probed cid partitions, exact
  *    top-k within them. ONE shuffle on the centroid key.
  *  - [[retrain]]: explicit, versioned O(index) operation — re-run
  *    Lloyd's over the stored vectors, reassign, rewrite, commit. Time
  *    travel across the boundary works because each manifest pins its
  *    OWN codebook with its file set (searching v1 after a retrain uses
  *    v1's centroids against v1's files — never a mixed read).
  *  - [[delete]]: O(batch) logical removal — ids land in a tombstone
  *    sidecar the probed read anti-joins (the FAISS IDSelector
  *    pattern); physical reclaim at compact (`reclaimDeletes`) or
  *    retrain, both of which reset the sidecar list.
  *
  * Appends are append-only (an index, not a table): re-appending a
  * LIVE vec_id duplicates it. Route replacements through retrain, or
  * dedup upstream (HistoricalDedup-style anti-join on vec_id).
  * Re-appending a TOMBSTONED id RESURRECTS it: the append consolidates
  * the sidecars minus the incoming ids (O(tombstones), bounded), so
  * the id-level filter cannot swallow the new vector. BATCH REPLAY
  * is the exception: append's optional (appId, version) transaction
  * records progress in the manifest, so a streaming sink's redelivered
  * micro-batch is skipped, not duplicated (streaming.EmbeddingStream).
  *
  * Stored row: (vec_id long, v array<double>, nrm double) — norm
  * precomputed at write time so search never recomputes it. Centroid
  * doubles round-trip the manifest via Double.toString/parseDouble
  * (exact), so a reopened index assigns bit-identically.
  */
object IvfIndex {

  final case class IndexManifest(version: Long, dim: Int,
                                 centroids: Array[Array[Double]],
                                 paths: Map[Int, Seq[String]],
                                 quantized: Boolean = false,
                                 txns: Map[String, Long] = Map.empty,
                                 tombstones: Seq[String] = Seq.empty)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, version: Long): Path =
    new Path(s"$dir/_manifests/v%020d.manifest".format(version))

  /** Manifest: `dim\t<d>` then one `c\t<cid>\t<x,x,…>` per centroid
    * (order = cid), then `p\t<cid>\t<relative path>` lines (a cid may
    * list many paths — appends accumulate). */
  private def body(m: IndexManifest): String =
    (Seq(s"dim\t${m.dim}") ++
      // full-precision indexes omit the line (older manifests parse
      // identically); sq8 marks the stored-row schema switch
      (if (m.quantized) Seq("quant\tsq8") else Seq.empty) ++
      // writer-app transaction versions (the upsert table's pattern):
      // a replayed streaming append is recognized and skipped
      m.txns.toSeq.sortBy(_._1).map { case (a, v) => s"txn\t$a\t$v" } ++
      m.centroids.zipWithIndex.map { case (c, i) =>
        s"c\t$i\t${c.map(_.toString).mkString(",")}"
      } ++
      m.paths.toSeq.sortBy(_._1).flatMap { case (cid, rels) =>
        rels.sorted.map(rel => s"p\t$cid\t$rel")
      } ++
      // tombstone id-file dirs (the delete sidecar): absent line =
      // no deletes, older manifests parse identically
      m.tombstones.sorted.map(rel => s"t\t$rel")).mkString("\n")

  private def parse(version: Long, text: String): IndexManifest = {
    val lines = text.split('\n').filter(_.nonEmpty)
    val dim = lines.head.split('\t')(1).toInt
    val cents = lines.filter(_.startsWith("c\t")).map { l =>
      val Array(_, cid, xs) = l.split('\t')
      cid.toInt -> xs.split(',').map(java.lang.Double.parseDouble)
    }.sortBy(_._1).map(_._2)
    val paths = lines.filter(_.startsWith("p\t")).map { l =>
      val Array(_, cid, rel) = l.split('\t')
      cid.toInt -> rel
    }.groupBy(_._1).map { case (cid, rs) => cid -> rs.map(_._2).toSeq }
    val txns = lines.filter(_.startsWith("txn\t")).map { l =>
      val Array(_, a, v) = l.split('\t')
      a -> v.toLong
    }.toMap
    val tombs = lines.filter(_.startsWith("t\t")).map(_.split('\t')(1)).toSeq
    IndexManifest(version, dim, cents, paths,
      quantized = lines.contains("quant\tsq8"), txns = txns,
      tombstones = tombs)
  }

  def currentManifest(spark: SparkSession, dir: String): Option[IndexManifest] = {
    val fs = fsOf(spark, dir)
    val mdir = new Path(s"$dir/_manifests")
    if (!fs.exists(mdir)) return None
    val versions = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
    if (versions.isEmpty) None
    else Some(readManifest(fs, dir, versions.max))
  }

  private def readManifest(fs: FileSystem, dir: String, version: Long): IndexManifest =
    parse(version, AtomicPublish.readText(fs, manifestPath(dir, version)))

  private def requireManifest(spark: SparkSession, dir: String): IndexManifest =
    currentManifest(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir is not an initialized IVF index — run IvfIndex.build first"))

  def codebook(spark: SparkSession, dir: String): Array[Array[Double]] =
    requireManifest(spark, dir).centroids

  /** Committed versions, newest first. */
  def history(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val mdir = new Path(s"$dir/_manifests")
    if (!fs.exists(mdir)) return Seq.empty
    fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted.reverse.toSeq
  }

  private def newStaging(fs: FileSystem, dir: String): String = {
    val dataDir = new Path(s"$dir/data")
    val existingMax =
      if (!fs.exists(dataDir)) 0L
      else fs.listStatus(dataDir).map(_.getPath.getName)
        .filter(_.startsWith("v"))
        .flatMap { n =>
          val digits = n.stripPrefix("v").takeWhile(_.isDigit)
          if (digits.nonEmpty) Some(digits.toLong) else None
        }.foldLeft(0L)(math.max)
    s"v${existingMax + 1}-${java.util.UUID.randomUUID.toString.take(8)}"
  }

  /** Assign (vec_id, embedding) rows with the given codebook and write
    * them by cid under a fresh staging; returns cid -> relative path
    * for the cids actually written. */
  private def writeAssigned(spark: SparkSession, dir: String, vecs: DataFrame,
                            centroids: Array[Array[Double]], dim: Int,
                            staging: String,
                            quantized: Boolean = false): Map[Int, Seq[String]] = {
    val base = Knn.ivfAssign(
        Knn.withNorm(vecs, "embedding").filter(size(col("v")) === dim),
        centroids, nprobe = 1)
    // sq8 rows store int8 codes + the per-vector absmax scale instead
    // of the doubles (4-8x smaller on disk and through every probed
    // read); nrm stays the EXACT norm of the original vector so the
    // quantized score's denominator is not itself an approximation
    val assigned =
      if (quantized) base
        .withColumn("scale", Quantize.absmaxScale(col("v")))
        .select(col("vec_id"),
          Quantize.int8Codes(col("v"), col("scale")).as("q"),
          col("scale"), col("nrm"), col("cid"))
      else base.select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    assigned.write.mode("errorifexists")
      .partitionBy("cid").parquet(s"$dir/data/$staging")
    val fs = fsOf(spark, dir)
    fs.listStatus(new Path(s"$dir/data/$staging"))
      .map(_.getPath.getName).filter(_.startsWith("cid="))
      .map(n => n.stripPrefix("cid=").toInt ->
        Seq(s"data/$staging/$n")).toMap
  }

  /** Train + assign + commit v1. `corpus` carries (vec_id, embedding).
    * `quantized = true` stores int8 absmax codes + per-vector scale
    * (the FAISS SQ8 storage rung) instead of the double vectors —
    * search then scores on the dequantized dot and should re-rank its
    * top candidates against the full-precision source (the `refine`
    * parameter of [[search]]). */
  def build(corpus: DataFrame, dir: String, dim: Int, k: Int,
            iters: Int = 5, seed: Long = 42L,
            quantized: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    if (currentManifest(spark, dir).nonEmpty)
      throw new IllegalStateException(
        s"$dir is already an IVF index; append into it, retrain it, or " +
          s"choose a fresh directory")
    val centroids = Knn.ivfCentroids(corpus, dim, k, iters, seed)
    val fs = fsOf(spark, dir)
    val staging = newStaging(fs, dir)
    val written = writeAssigned(spark, dir, corpus, centroids, dim, staging,
      quantized)
    AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, 1L),
      body(IndexManifest(1L, dim, centroids, written, quantized)))
  }

  /** Assign-only incremental maintenance: one broadcast-codebook argmax
    * per new vector, a fresh staging dir, and a manifest that reuses
    * every existing file — O(batch) however large the index.
    *
    * `txn` = (writerAppId, monotonic version) makes the append
    * IDEMPOTENT across replays — without it, appends are append-only
    * and a redelivered batch DUPLICATES its vectors (the documented
    * contract above). A streaming sink must pass its (checkpoint,
    * batchId) here: a replayed micro-batch is then recognized from the
    * manifest and skipped before anything is staged, and a crash after
    * publish but before the checkpoint advanced replays to a no-op —
    * the same exactly-once composition as the upsert sink. */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame,
             txn: Option[(String, Long)] = None): Unit = {
    val m = requireManifest(spark, dir)
    txn.foreach { case (app, ver) =>
      if (m.txns.get(app).exists(_ >= ver)) return
    }
    val fs = fsOf(spark, dir)
    // a TRUE empty batch is a no-op; a batch whose vectors would ALL
    // (or partially) be dropped by the dim/zero-norm filter is DATA
    // LOSS and must fail loudly — an index append silently losing
    // vectors is the one wrong answer (two batch-bounded counts)
    // pin the batch before the guard counts AND the write read it:
    // un-persisted, the pipeline would be evaluated three times, and a
    // non-deterministic source could pass the total/eligible guard yet
    // write a different set of rows
    val pinned = newVecs.persist()
    try {
      val total = pinned.count()
      if (total == 0) return // burn no version, stage nothing
      val eligible = Knn.withNorm(pinned, "embedding")
        .filter(size(col("v")) === m.dim).count()
      if (eligible < total)
        throw new IllegalArgumentException(
          s"append would drop ${total - eligible} of $total vectors " +
            s"(dimension != ${m.dim} or zero norm) — filter or fix " +
            s"upstream; an index append must not silently lose vectors")
      val staging = newStaging(fs, dir)
      val written = writeAssigned(spark, dir, pinned, m.centroids, m.dim,
        staging, m.quantized)
      val merged = (m.paths.keySet ++ written.keySet).map { cid =>
        cid -> (m.paths.getOrElse(cid, Seq.empty) ++
          written.getOrElse(cid, Seq.empty))
      }.toMap
      // RESURRECTION: a tombstoned id being re-appended must become
      // visible again — the id-level anti-join would otherwise swallow
      // the new vector silently (review finding r13). If any incoming
      // id overlaps the sidecars, consolidate them into ONE new sidecar
      // minus the batch ids (O(tombstones), a bounded frame); appends
      // with no overlap (the overwhelming case) pay one anti-join count
      // on the bounded sidecar only.
      val newTombs: Seq[String] =
        if (m.tombstones.isEmpty) m.tombstones
        else {
          val tombs = tombstoneIds(spark, dir, m)
          val overlap = tombs.join(pinned.select(col("vec_id")),
            Seq("vec_id"), "left_semi")
          if (overlap.isEmpty) m.tombstones
          else {
            val survivors = tombs.join(pinned.select(col("vec_id")),
              Seq("vec_id"), "left_anti")
            if (survivors.isEmpty) Seq.empty
            else {
              val trel = s"tomb/${newStaging(fs, dir)}"
              survivors.coalesce(1).write.mode("errorifexists")
                .parquet(s"$dir/$trel")
              Seq(trel)
            }
          }
        }
      try AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, m.version + 1),
        body(m.copy(version = m.version + 1, paths = merged,
          txns = m.txns ++ txn, tombstones = newTombs)))
      catch {
        case e: java.util.ConcurrentModificationException =>
          // same-txn publish race (zombie vs takeover driver replaying
          // one micro-batch): if the winner recorded OUR txn, this
          // replay already happened — succeed instead of failing the
          // query (mirror of PartitionedUpsert.merge's recovery). The
          // loser's staged files are unreferenced and age out via
          // vacuum, like any crashed-before-publish staging dir.
          if (!txn.exists { case (app, ver) =>
            currentManifest(spark, dir).exists(_.txns.get(app).exists(_ >= ver))
          }) throw e
      }
    } finally { pinned.unpersist(); () }
  }

  /** Stored assignments of one version, cid partition column restored;
    * `onlyCids` prunes the read to the probed inverted lists.
    * Tombstoned vec_ids are filtered out here — ONE anti-join against
    * the manifest's id sidecar (empty sidecar = no join at all), so
    * every consumer (search, retrain, tuneNprobe, readVectors) sees
    * the post-delete index without each re-implementing the filter. */
  private def readAssignments(spark: SparkSession, dir: String,
                              m: IndexManifest,
                              onlyCids: Option[Set[Int]] = None): DataFrame = {
    val wanted = onlyCids.map(cs => m.paths.filter(c => cs(c._1)))
      .getOrElse(m.paths)
    val perCid = wanted.toSeq.sortBy(_._1).map { case (cid, rels) =>
      spark.read.parquet(rels.sorted.map(rel => s"$dir/$rel"): _*)
        .withColumn("cid", lit(cid))
    }
    val raw =
      if (perCid.isEmpty) {
        val empty = spark.range(0)
        if (m.quantized)
          empty.select(col("id").as("vec_id"),
            array().cast("array<int>").as("q"), lit(0.0).as("scale"),
            lit(0.0).as("nrm"), lit(0).as("cid"))
        else
          empty.select(col("id").as("vec_id"),
            array().cast("array<double>").as("v"), lit(0.0).as("nrm"),
            lit(0).as("cid"))
      } else perCid.reduce(_.unionByName(_))
    if (m.tombstones.isEmpty) raw
    else raw.join(tombstoneIds(spark, dir, m), Seq("vec_id"), "left_anti")
  }

  /** Distinct deleted vec_ids of one version (empty frame if none). */
  private def tombstoneIds(spark: SparkSession, dir: String,
                           m: IndexManifest): DataFrame =
    if (m.tombstones.isEmpty)
      spark.range(0).select(col("id").as("vec_id"))
    else spark.read
      .parquet(m.tombstones.sorted.map(rel => s"$dir/$rel"): _*)
      .select(col("vec_id")).distinct()

  /** Stored vectors of the current version (for retrain / audit);
    * `onlyCids` exposes the same pruned read the search path uses. */
  def readVectors(spark: SparkSession, dir: String,
                  onlyCids: Option[Set[Int]] = None): DataFrame =
    readAssignments(spark, dir, requireManifest(spark, dir), onlyCids)

  /** Delete vectors by id — the FAISS IDSelector pattern adapted to a
    * manifest-committed index: the ids land in a parquet SIDECAR under
    * `tomb/`, the new manifest references it, and every read of this
    * and later versions anti-joins the sidecar ([[readAssignments]]).
    * O(delete batch): no data file is touched, which is the point —
    * an index that can only shrink via full retrain cannot serve a
    * dedup pipeline that REMOVES documents. Physical reclaim happens
    * at [[compactIndex]] (`reclaimDeletes = true`) or [[retrain]]
    * (which rebuilds from the tomb-filtered read and resets the
    * sidecar list). Time travel is preserved: a pre-delete manifest
    * has no sidecar line and still returns the vector. A later
    * [[append]] of a tombstoned id RESURRECTS it (the append
    * consolidates the sidecars minus its batch), so the id filter
    * never swallows a newer vector.
    *
    * Ids absent from the index tombstone to a no-op (the filter never
    * matches). An empty batch burns no version. `txn` has the same
    * replay-idempotence contract as [[append]]. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
             txn: Option[(String, Long)] = None): Unit = {
    val m = requireManifest(spark, dir)
    txn.foreach { case (app, ver) =>
      if (m.txns.get(app).exists(_ >= ver)) return
    }
    val fs = fsOf(spark, dir)
    val pinned = ids.select(col("vec_id").cast("long").as("vec_id"))
      .distinct().persist()
    try {
      if (pinned.count() == 0) return
      val staging = newStaging(fs, dir)
      val rel = s"tomb/$staging"
      // one sidecar file per delete batch: the id list is the bounded
      // side (a filter input, not data), and the anti-join reads it
      // whole every search — small-file pressure belongs on compact
      pinned.coalesce(1).write.mode("errorifexists").parquet(s"$dir/$rel")
      try AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, m.version + 1),
        body(m.copy(version = m.version + 1,
          tombstones = m.tombstones :+ rel, txns = m.txns ++ txn)))
      catch {
        case e: java.util.ConcurrentModificationException =>
          // same recovery as append: if the publish winner recorded OUR
          // txn, this is a replay — succeed; the staged sidecar ages
          // out via vacuum like any crashed write
          if (!txn.exists { case (app, ver) =>
            currentManifest(spark, dir).exists(_.txns.get(app).exists(_ >= ver))
          }) throw e
      }
    } finally { pinned.unpersist(); () }
  }

  /** @param excludeSelfId drop hits where the stored vec_id equals the
    *        query's vec_id — correct when queries are drawn FROM the
    *        indexed corpus (the ivfTopK self-search convention, and
    *        what the parity specs assert). Pass FALSE for an external
    *        query set with its own id space: there an id collision is
    *        a coincidence, and excluding it would silently drop a real
    *        neighbour.
    * @param refine for a QUANTIZED index: (full-precision source with
    *        (vec_id, embedding), candidate factor c) — the top c·k by
    *        dequantized score are re-ranked with exact dots against
    *        the source (FAISS's refine stage; the source is read only
    *        for the candidate ids, a semi-bounded join). Ignored for
    *        full-precision indexes, whose scores are already exact. */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nprobe: Int, excludeSelfId: Boolean = true,
             refine: Option[(DataFrame, Int)] = None): DataFrame =
    searchManifest(spark, dir, requireManifest(spark, dir), queries, k,
      nprobe, excludeSelfId, refine)

  /** Time travel: search AS OF a committed version — its codebook
    * against its file set, never a mixed read. */
  def searchVersion(spark: SparkSession, dir: String, version: Long,
                    queries: DataFrame, k: Int, nprobe: Int,
                    excludeSelfId: Boolean = true,
                    refine: Option[(DataFrame, Int)] = None): DataFrame = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(manifestPath(dir, version)))
      throw new IllegalArgumentException(
        s"version $version does not exist at $dir")
    searchManifest(spark, dir, readManifest(fs, dir, version), queries, k,
      nprobe, excludeSelfId, refine)
  }

  private def searchManifest(spark: SparkSession, dir: String,
                             m: IndexManifest, queries: DataFrame,
                             k: Int, nprobe: Int,
                             excludeSelfId: Boolean,
                             refine: Option[(DataFrame, Int)] = None): DataFrame = {
    val q = Knn.ivfAssign(
        Knn.withNorm(queries, "embedding").filter(size(col("v")) === m.dim),
        m.centroids, nprobe)
      .select(col("vec_id").as("q_vec_id"), col("cid"),
        col("v").as("qv"), col("nrm").as("qn"))
    // the probe plan is ≤ |codebook| ints of driver state; the query
    // assignment is recomputed in the scoring join below — queries are
    // the bounded side, and staying lazy beats materializing here
    val probed = q.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSet
    val stored = readAssignments(spark, dir, m, Some(probed))
    // quantized score: dot(q, dequant(codes)) = dot(q, codes)·scale/127
    // — the scale factors OUT of the int dot, so no per-row dequantized
    // array is ever materialized
    val c =
      if (m.quantized) stored.select(col("vec_id").as("c_vec_id"),
        col("cid"), col("q").cast("array<double>").as("cv"),
        col("scale"), col("nrm").as("cn"))
      else stored.select(col("vec_id").as("c_vec_id"), col("cid"),
        col("v").as("cv"), lit(null).cast("double").as("scale"),
        col("nrm").as("cn"))
    val rawSim =
      if (m.quantized)
        Knn.dotNative(col("qv"), col("cv")) * col("scale") /
          (lit(127.0) * col("qn") * col("cn"))
      else Knn.dotNative(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val scored = c.join(q, "cid")
      .filter(!lit(excludeSelfId) || col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("sim", rawSim)
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("sim").desc, col("c_vec_id").asc)
    refine match {
      case Some((full, factor)) if m.quantized =>
        require(factor >= 1, s"refine factor must be >= 1, got $factor")
        val cand = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k.toLong * factor)
          .select(col("q_vec_id"), col("c_vec_id"), col("qv"), col("qn"),
            col("sim").as("__qsim"))
        val f = Knn.withNorm(full, "embedding")
          .select(col("vec_id").as("c_vec_id"), col("v").as("fv"),
            col("nrm").as("fn"))
        // LEFT join: a candidate the refine source lacks (stale corpus
        // passed after an append) keeps its quantized score instead of
        // vanishing — degraded precision for that hit, never a silently
        // dropped neighbour (the append guard's loud-failure stance)
        val exact = cand.join(f, Seq("c_vec_id"), "left_outer")
          .withColumn("sim", when(col("fv").isNotNull,
            Knn.dotNative(col("qv"), col("fv")) / (col("qn") * col("fn")))
            .otherwise(col("__qsim")))
        exact.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
            round(col("sim"), 4).as("sim"))
      case _ =>
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
            round(col("sim"), 4).as("sim"))
    }
  }

  /** Result of [[tuneNprobe]]: the chosen dial plus the evidence —
    * the full measured recall@nprobe curve (one point per candidate,
    * bounded by the codebook size) and the expected index fraction a
    * search at the chosen nprobe scans. */
  final case class NprobeTuning(nprobe: Int, recall: Double,
                                scanFraction: Double,
                                curve: Seq[(Int, Double)])

  /** Pick the SMALLEST nprobe whose measured recall@k on a probe
    * sample meets `targetRecall` — the auto-tuner for the dial
    * [[search]] exposes (raising nprobe buys recall linearly in read
    * cost; nothing tells a user where to stop without measuring).
    *
    * Ground truth is this index's own probe-all search (nprobe =
    * |codebook|), which equals exhaustive scoring — the invariant the
    * parity specs assert. For a QUANTIZED index this therefore tunes
    * the PRUNING recall in the index's own score space; quantization
    * loss is a separate axis owned by the refine stage.
    *
    * Cost model (why this is ONE cheap pass, not |codebook| searches):
    * a stored true neighbour enters a query's candidate set exactly
    * when nprobe reaches the probe RANK of the neighbour's home cell
    * in that query's centroid ordering — and once probed it can never
    * be displaced from the top-k by a non-neighbour (its similarity
    * is, by definition of the truth set, at least the k-th best).
    * So the whole recall-vs-nprobe curve is the cumulative histogram
    * of those probe ranks: ONE probe-all search over the sample + one
    * join to the stored assignments + a ≤|codebook|-row aggregate
    * (bounded driver state, the codebook class). Search cost at the
    * chosen dial ≈ nprobe/|codebook| of the index on a balanced
    * codebook — reported as `scanFraction` measured from the actual
    * probed-cell sizes of the sample.
    *
    * `sampleQueries` should be a representative bounded sample
    * ((vec_id, embedding)); recall on held-out queries matches to
    * sampling error — assert with a margin, the HLL convention. */
  def tuneNprobe(spark: SparkSession, dir: String, sampleQueries: DataFrame,
                 k: Int, targetRecall: Double,
                 excludeSelfId: Boolean = true): NprobeTuning = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    val m = requireManifest(spark, dir)
    val kc = m.centroids.length
    val truth = searchManifest(spark, dir, m, sampleQueries, k, nprobe = kc,
        excludeSelfId)
      .select(col("q_vec_id"), col("c_vec_id"))
    val homes = readAssignments(spark, dir, m, None)
      .select(col("vec_id").as("c_vec_id"), col("cid"))
    val ranks = Knn.ivfProbeRanks(
        Knn.withNorm(sampleQueries, "embedding")
          .filter(size(col("v")) === m.dim),
        m.centroids)
      .select(col("vec_id").as("q_vec_id"), col("cid"), col("crn"))
    val hist = truth.join(homes, "c_vec_id")
      .join(ranks, Seq("q_vec_id", "cid"))
      .groupBy(col("crn")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = hist.values.sum
    require(total > 0, "probe sample produced no ground-truth neighbours " +
      "(empty index, zero-norm sample, or dim mismatch)")
    val curve = (1 to kc).scanLeft(0L)((acc, np) =>
        acc + hist.getOrElse(np, 0L))
      .drop(1).zipWithIndex
      .map { case (cum, i) => (i + 1, cum.toDouble / total) }
    val chosen = curve.find(_._2 >= targetRecall)
      .getOrElse(curve.last) // probe-all is recall 1.0 by construction
    // measured fraction of stored vectors a search at `chosen` reads:
    // distinct probed cells over the sample, weighted by cell size
    val cellSizes = homes.groupBy(col("cid")).agg(count(lit(1)).as("cn"))
    val probedFrac = ranks.filter(col("crn") <= chosen._1)
      .select(col("q_vec_id"), col("cid"))
      .join(cellSizes, "cid")
      .groupBy(col("q_vec_id")).agg(sum(col("cn")).as("read"))
      .agg(avg(col("read"))).head().getDouble(0) /
      math.max(1L, cellSizes.agg(sum(col("cn"))).head().getLong(0)).toDouble
    NprobeTuning(chosen._1, chosen._2, probedFrac, curve)
  }

  /** Physical footprint of the current version: (data files, bytes) —
    * the observable the sq8 rung exists for (and the fragmentation
    * signal for [[compactIndex]]). */
  def indexStats(spark: SparkSession, dir: String): (Int, Long) = {
    val m = requireManifest(spark, dir)
    val fs = fsOf(spark, dir)
    val files = m.paths.values.flatten.toSeq.flatMap { rel =>
      fs.listStatus(new Path(s"$dir/$rel"))
        .filter(_.getPath.getName.endsWith(".parquet"))
    }
    (files.length, files.map(_.getLen).sum)
  }

  /** Compact a centroid's accumulated append files (the small-file
    * problem of assign-only appends: every [[append]] adds at least
    * one file per touched cid, and a year of hourly appends drowns
    * the probed read in per-file open/footer overhead). Rewrites ONLY
    * cids whose file count exceeds `maxFilesPerCid` — one file each —
    * and publishes a version that reuses every other cid's files.
    * Data is bit-identical; O(fragmented cids), not O(index). Returns
    * the cids compacted (empty = nothing fragmented, no version
    * burned).
    *
    * `reclaimDeletes = true` also rewrites every cid holding a
    * tombstoned row and drops the tombstone sidecars from the new
    * manifest — the physical half of [[delete]]. */
  def compactIndex(spark: SparkSession, dir: String,
                   maxFilesPerCid: Int = 4,
                   reclaimDeletes: Boolean = false): Seq[Int] = {
    require(maxFilesPerCid >= 1,
      s"maxFilesPerCid must be >= 1, got $maxFilesPerCid")
    val m = requireManifest(spark, dir)
    val fs = fsOf(spark, dir)
    val fragmented = m.paths.filter { case (_, rels) =>
      rels.map(rel => fs.listStatus(new Path(s"$dir/$rel"))
        .count(_.getPath.getName.endsWith(".parquet"))).sum > maxFilesPerCid
    }
    // reclaimDeletes additionally rewrites every cid holding a
    // tombstoned row (found by ONE join of the sidecar against the
    // stored assignments — pruned nothing, but O(index scan) is the
    // honest cost of physical reclaim), after which the new manifest
    // drops the sidecar list entirely: every surviving file is clean
    val deletedCids: Set[Int] =
      if (!reclaimDeletes || m.tombstones.isEmpty) Set.empty
      else {
        // raw read (no tomb filter): we need the HOMES of deleted rows
        val wanted = m.paths.toSeq.sortBy(_._1).map { case (cid, rels) =>
          spark.read.parquet(rels.sorted.map(rel => s"$dir/$rel"): _*)
            .select(col("vec_id")).withColumn("cid", lit(cid))
        }
        if (wanted.isEmpty) Set.empty
        else wanted.reduce(_.unionByName(_))
          .join(tombstoneIds(spark, dir, m), Seq("vec_id"), "left_semi")
          .select(col("cid")).distinct()
          .collect().map(_.getInt(0)).toSet
      }
    val rewrite = fragmented.keySet.toSet ++ deletedCids
    val dropTombs = reclaimDeletes && m.tombstones.nonEmpty
    if (rewrite.isEmpty && !dropTombs) return Seq.empty
    val newTombs = if (reclaimDeletes) Seq.empty[String] else m.tombstones
    if (rewrite.isEmpty) {
      // deletes existed but hit no stored row (ids never present):
      // the sidecar is pure overhead — drop it without rewriting data
      AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, m.version + 1),
        body(m.copy(version = m.version + 1, tombstones = newTombs)))
      return Seq.empty
    }
    val staging = newStaging(fs, dir)
    readAssignments(spark, dir, m, Some(rewrite))
      .repartition(rewrite.size, col("cid"))
      .write.mode("errorifexists")
      .partitionBy("cid").parquet(s"$dir/data/$staging")
    val written = fs.listStatus(new Path(s"$dir/data/$staging"))
      .map(_.getPath.getName).filter(_.startsWith("cid="))
      .map(n => n.stripPrefix("cid=").toInt -> Seq(s"data/$staging/$n"))
      .toMap
    // a rewritten cid whose rows were ALL deleted writes no files —
    // it must leave the manifest, not keep its stale paths
    val emptied = rewrite -- written.keySet
    AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, m.version + 1),
      body(m.copy(version = m.version + 1,
        paths = (m.paths -- emptied) ++ written, tombstones = newTombs)))
    rewrite.toSeq.sorted
  }

  /** Reclaim staging dirs unreachable from the `keepManifests` newest
    * manifests (and drop the older manifests) — same snapshot-
    * isolation contract and in-flight-write age guard as the upsert
    * table's vacuum: an unreachable staging younger than
    * `minStagingAgeMs` may be an uncommitted build/append/retrain and
    * is left alone; crashed writes age past the guard and go on a
    * later run. */
  def vacuum(spark: SparkSession, dir: String, keepManifests: Int = 2,
             minStagingAgeMs: Long = 3600000L): Unit = {
    require(keepManifests >= 1, "must keep at least the current manifest")
    val fs = fsOf(spark, dir)
    val mdir = new Path(s"$dir/_manifests")
    if (!fs.exists(mdir)) return
    val versions = fs.listStatus(mdir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted
    val cutoff = System.currentTimeMillis() - minStagingAgeMs
    val newest = versions.takeRight(keepManifests).toSet
    val kept = versions.filter { v =>
      newest.contains(v) ||
        fs.getFileStatus(manifestPath(dir, v)).getModificationTime >= cutoff
    }
    val keptManifests = kept.map(readManifest(fs, dir, _))
    val reachable: Set[String] = keptManifests.flatMap {
      _.paths.values.flatten.map(_.split('/')(1)) // "data/<staging>/cid=<i>"
    }.toSet
    val dataDir = new Path(s"$dir/data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        if (!reachable.contains(st.getPath.getName) &&
            st.getModificationTime < cutoff) {
          fs.delete(st.getPath, true); ()
        }
      }
    // tombstone sidecars obey the same reachability + age rules
    val reachableTombs: Set[String] = keptManifests.flatMap {
      _.tombstones.map(_.split('/')(1)) // "tomb/<staging>"
    }.toSet
    val tombDir = new Path(s"$dir/tomb")
    if (fs.exists(tombDir))
      fs.listStatus(tombDir).foreach { st =>
        if (!reachableTombs.contains(st.getPath.getName) &&
            st.getModificationTime < cutoff) {
          fs.delete(st.getPath, true); ()
        }
      }
    versions.filterNot(kept.contains).foreach { v =>
      fs.delete(manifestPath(dir, v), false); ()
    }
    fs.listStatus(mdir)
      .filter(st => st.getPath.getName.startsWith(".tmp-") &&
        st.getModificationTime < cutoff)
      .foreach { st => fs.delete(st.getPath, false); () }
  }

  /** Explicit O(index) re-optimization: re-run Lloyd's over the stored
    * vectors, reassign every vector under the NEW codebook, rewrite
    * into one staging, commit as the next version. Old versions stay
    * searchable (their manifests pin codebook + files) until their
    * staging dirs are manually reclaimed. */
  def retrain(spark: SparkSession, dir: String, k: Int,
              iters: Int = 5, seed: Long = 42L): Unit = {
    val m = requireManifest(spark, dir)
    // an sq8 index retrains from its RECONSTRUCTIONS (code·scale/127):
    // the stored doubles are gone by design, and a codebook trained on
    // ≤0.8%-perturbed points partitions the space the same way — the
    // standard quantized-retrain trade (re-coding quantizes what was
    // already quantized once; vectors never degrade FURTHER because
    // each version re-codes from the same reconstructions it stores)
    val stored =
      if (m.quantized) readAssignments(spark, dir, m)
        .select(col("vec_id"),
          Quantize.dequantize(col("q"), col("scale")).as("embedding"))
      else readAssignments(spark, dir, m)
        .select(col("vec_id"), col("v").as("embedding"))
    val centroids = Knn.ivfCentroids(stored, m.dim, k, iters, seed)
    val fs = fsOf(spark, dir)
    val staging = newStaging(fs, dir)
    val written = writeAssigned(spark, dir, stored, centroids, m.dim, staging,
      m.quantized)
    // tombstones reset by construction: `stored` came through the
    // tomb-filtered read, so the rewrite IS the physical reclaim
    AtomicPublish.publishNoOverwrite(fs, manifestPath(dir, m.version + 1),
      body(IndexManifest(m.version + 1, m.dim, centroids, written,
        m.quantized, m.txns)))
  }
}
