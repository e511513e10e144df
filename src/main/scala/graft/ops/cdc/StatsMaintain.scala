package graft.ops.cdc

import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Incrementally maintained TABLE STATISTICS — the auto-ANALYZE rung.
  * A cost-based planner (join ordering, broadcast thresholds,
  * selectivity) runs on row counts, null fractions, value bounds and
  * NDV; at 100 TB re-scanning the table to refresh them is exactly the
  * recompute the whole maintenance family exists to avoid. This
  * derives the profile from the same change data feed AggMaintain
  * consumes: per window the update is O(changed buckets), never
  * O(table).
  *
  * The delta algebra is honest about what composes and what does not
  * (the min/max-from-deltas boundary AggMaintain's scaladoc draws,
  * applied to statistics):
  *
  *  - rows and per-column null counts compose EXACTLY (± deltas).
  *  - min/max (integral columns) compose exactly under inserts; a
  *    delete/update that removes a CURRENT boundary value cannot be
  *    recomputed from deltas — the stored bound stays (still covering:
  *    removals only shrink the true range) and `minmaxExact` drops to
  *    false until [[refresh]].
  *  - NDV rides a mergeable HLL sketch (the datasketches aggregate):
  *    inserts/updated-values UNION in exactly; sketches cannot
  *    subtract, so deletes and value-changing updates accumulate in
  *    `staleDeletes` — the estimate remains a valid UPPER bound, and
  *    `staleDeletes/rows` is the refresh signal.
  *
  * Storage is a versioned single-file profile under `statsDir/_stats`
  * committed via [[AtomicPublish.publishNoOverwrite]] (the DagCommit
  * pointer pattern — tiny, atomic, crash-safe): each version records
  * the SOURCE table version it reflects, so a replayed maintenance
  * step is recognized and skipped (metadata no-op, the txn-cursor
  * convention), and a crash between computing and publishing leaves
  * the previous profile intact.
  *
  * Columns: min/max tracked for LongType columns (the BucketStat
  * integral rule); NDV for LongType and StringType (the types the
  * bundled HLL aggregate accepts); null counts for every stat'd
  * column.
  */
object StatsMaintain {

  final case class ColStats(nulls: Long, min: Option[Long], max: Option[Long],
                            minmaxExact: Boolean, ndv: Option[Array[Byte]],
                            staleDeletes: Long,
                            quant: Option[Array[Byte]] = None)

  final case class TableStats(version: Long, cursor: Long, rows: Long,
                              cols: Map[String, ColStats]) {
    /** NDV estimate for `c` (an upper bound once staleDeletes > 0). */
    def ndvEstimate(spark: SparkSession, c: String): Option[Double] =
      cols(c).ndv.map { bytes =>
        spark.range(1).select(hll_sketch_estimate(lit(bytes)).as("e"))
          .head().getLong(0).toDouble
      }

    /** Quantile estimates for `c` at `ranks` (KLL ~1.65% rank error at
      * the default k; reflects inserts only once staleDeletes > 0 —
      * the same refresh signal as NDV). */
    def quantileEstimate(c: String, ranks: Seq[Double]): Option[Seq[Double]] =
      cols(c).quant.map(graft.functions.KllQuantiles.quantiles(_, ranks))

    /** Estimated selectivity of `c <= value` — the predicate price a
      * CBO derives from the quantile profile. */
    def rankEstimate(c: String, value: Double): Option[Double] =
      cols(c).quant.map(graft.functions.KllQuantiles.rankOf(_, value))
  }

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statsPath(statsDir: String, v: Long): Path =
    new Path(s"$statsDir/_stats/v%020d.stats".format(v))

  private def body(t: TableStats): String = {
    val head = s"cursor\t${t.cursor}\nrows\t${t.rows}"
    val cols = t.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      Seq("col", n, c.nulls,
        c.min.map(_.toString).getOrElse("-"),
        c.max.map(_.toString).getOrElse("-"),
        if (c.minmaxExact) "1" else "0",
        c.ndv.map(Base64.getEncoder.encodeToString).getOrElse("-"),
        c.staleDeletes,
        c.quant.map(Base64.getEncoder.encodeToString).getOrElse("-")).mkString("\t")
    }
    (head +: cols).mkString("\n")
  }

  private def parse(v: Long, text: String): TableStats = {
    val lines = text.split('\n').filter(_.nonEmpty)
    val kv = lines.filterNot(_.startsWith("col\t"))
      .map { l => val Array(k, x) = l.split('\t'); k -> x }.toMap
    val cols = lines.filter(_.startsWith("col\t")).map { l =>
      val p = l.split('\t')
      p(1) -> ColStats(p(2).toLong,
        if (p(3) == "-") None else Some(p(3).toLong),
        if (p(4) == "-") None else Some(p(4).toLong),
        p(5) == "1",
        if (p(6) == "-") None else Some(Base64.getDecoder.decode(p(6))),
        p(7).toLong,
        if (p.length < 9 || p(8) == "-") None
        else Some(Base64.getDecoder.decode(p(8))))
    }.toMap
    TableStats(v, kv("cursor").toLong, kv("rows").toLong, cols)
  }

  /** Newest committed profile, or None before [[init]]. */
  def currentStats(spark: SparkSession, statsDir: String): Option[TableStats] = {
    val fs = fsOf(spark, statsDir)
    val base = new Path(s"$statsDir/_stats")
    if (!fs.exists(base)) return None
    val vs = fs.listStatus(base).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".stats"))
      .map(_.stripPrefix("v").stripSuffix(".stats").toLong)
    if (vs.isEmpty) None
    else Some(parse(vs.max,
      AtomicPublish.readText(fs, statsPath(statsDir, vs.max))))
  }

  private def statsOrFail(spark: SparkSession, statsDir: String): TableStats =
    currentStats(spark, statsDir).getOrElse(throw new IllegalStateException(
      s"$statsDir holds no stats profile — call StatsMaintain.init"))

  private def minMaxCols(schema: StructType, cols: Seq[String]): Set[String] =
    cols.filter(c => schema(c).dataType == LongType).toSet

  private def ndvCols(schema: StructType, cols: Seq[String]): Set[String] =
    cols.filter(c => schema(c).dataType == LongType ||
      schema(c).dataType == StringType).toSet

  /** Full-scan profile of the table's CURRENT committed version —
    * exact everywhere, the ANALYZE this module then keeps fresh. */
  private def profile(spark: SparkSession, tableDir: String,
                      cols: Seq[String], atVersion: Long): TableStats = {
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    require(m.version == atVersion, s"profile raced a concurrent commit")
    val df = PartitionedUpsert.read(spark, tableDir)
    cols.foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${tableDir}'s schema"))
    val mm = minMaxCols(m.schema, cols)
    val nd = ndvCols(m.schema, cols)
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
        (if (mm(c)) Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
         else Nil) ++
        (if (nd(c)) Seq(hll_sketch_agg(col(c)).as(s"__ndv_$c")) else Nil)
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    TableStats(0L, m.version, r.getAs[Long]("__rows"),
      cols.map { c =>
        c -> ColStats(r.getAs[Long](s"__nulls_$c"),
          if (mm(c)) Option(r.getAs[java.lang.Long](s"__min_$c")).map(_.longValue) else None,
          if (mm(c)) Option(r.getAs[java.lang.Long](s"__max_$c")).map(_.longValue) else None,
          minmaxExact = true,
          if (nd(c)) Option(r.getAs[Array[Byte]](s"__ndv_$c")) else None,
          staleDeletes = 0L,
          // quantile profile (KLL) for the integral columns — one extra
          // narrow pass each at init/refresh; maintenance pays only the
          // window
          if (mm(c)) graft.functions.KllQuantiles.sketchOf(df, col(c)) else None)
      }.toMap)
  }

  /** Profile the table at its current version and commit stats v1. */
  def init(spark: SparkSession, tableDir: String, statsDir: String,
           cols: Seq[String]): TableStats = {
    require(cols.nonEmpty, "stat at least one column")
    if (currentStats(spark, statsDir).nonEmpty)
      throw new IllegalStateException(s"$statsDir already holds stats")
    val v = PartitionedUpsert.manifestOrFail(spark, tableDir).version
    val t = profile(spark, tableDir, cols, v).copy(version = 1L)
    AtomicPublish.publishNoOverwrite(fsOf(spark, statsDir),
      statsPath(statsDir, 1L), body(t))
    t
  }

  /** Exact re-profile at the current table version (resets the
    * minmaxExact flag and the NDV staleness) — the O(table) escape
    * hatch the staleness counters exist to schedule. */
  def refresh(spark: SparkSession, tableDir: String, statsDir: String): TableStats = {
    val cur = statsOrFail(spark, statsDir)
    val v = PartitionedUpsert.manifestOrFail(spark, tableDir).version
    val t = profile(spark, tableDir, cur.cols.keys.toSeq.sorted, v)
      .copy(version = cur.version + 1)
    AtomicPublish.publishNoOverwrite(fsOf(spark, statsDir),
      statsPath(statsDir, t.version), body(t))
    t
  }

  /** Estimated in-memory size of the table, from the MAINTAINED row
    * count and the schema's per-row width (Catalyst defaultSize — the
    * same estimator Spark's own statistics fall back to). Exact rows ×
    * estimated width: honest about which side is which. */
  def estimatedSizeBytes(spark: SparkSession, tableDir: String,
                         statsDir: String): Option[Long] = {
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    currentStats(spark, statsDir).map { st =>
      val width = m.schema.fields.map(_.dataType.defaultSize.toLong).sum
      st.rows * width
    }
  }

  /** CBO-informed read: the maintained profile drives the broadcast
    * decision — the rung that closes the auto-ANALYZE loop. If the
    * estimated size ([[estimatedSizeBytes]]) clears the threshold, the
    * returned frame carries a broadcast hint, so a join against it
    * plans BroadcastHashJoin from STATS ALONE — no file-size sniffing,
    * no AQE runtime rescue (foreachBatch maintenance steps run with
    * AQE's streaming restrictions; this is exactly where a stats-fed
    * decision matters). `threshold` defaults to the session's
    * autoBroadcastJoinThreshold; -1 (the disabled sentinel) means only
    * an explicit threshold can trigger the hint. A profile lagging one
    * maintenance window under-counts by that window's inserts — the
    * caller choosing a threshold should leave the usual headroom (the
    * same slack any CBO leaves between estimate and executor memory). */
  def readWithStats(spark: SparkSession, tableDir: String, statsDir: String,
                    threshold: Option[Long] = None): DataFrame = {
    val df = PartitionedUpsert.read(spark, tableDir)
    // the conf accepts a bare byte count OR a size suffix; the disabled
    // sentinel "-1" is a bare count JavaUtils refuses to parse
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thr = threshold.getOrElse(
      scala.util.Try(raw.trim.toLong).getOrElse(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)))
    val est = estimatedSizeBytes(spark, tableDir, statsDir)
    if (thr > 0 && est.exists(_ <= thr)) df.hint("broadcast") else df
  }

  /** Advance the profile over the CDF window (cursor, current]. An
    * already-current profile returns unchanged with ZERO data reads
    * (the txn-cursor no-op); the window read is manifest-diff
    * bucket-pruned. */
  def maintain(spark: SparkSession, tableDir: String, statsDir: String): TableStats = {
    val cur = statsOrFail(spark, statsDir)
    val m = PartitionedUpsert.manifestOrFail(spark, tableDir)
    if (m.version == cur.cursor) return cur
    require(m.version > cur.cursor,
      s"stats cursor ${cur.cursor} is AHEAD of $tableDir v${m.version} — " +
        "wrong table for this stats profile?")
    val cols = cur.cols.keys.toSeq.sorted
    val mm = minMaxCols(m.schema, cols)
    val nd = ndvCols(m.schema, cols)
    val ch = PartitionedUpsert.changesBetweenImages(
      spark, tableDir, cur.cursor, m.version)
    val keyCol = m.keyCol
    def side(s: String, c: String) =
      if (c == keyCol) col(keyCol) else col(s).getField(c)
    val aggs =
      sum(when(col("change_type") === "insert", 1L)
        .when(col("change_type") === "delete", -1L).otherwise(0L))
        .as("__drows") +: cols.flatMap { c =>
        Seq(
          (sum(when(col("change_type") =!= "delete" &&
              side("after", c).isNull, 1L).otherwise(0L)) -
            sum(when(col("change_type") =!= "insert" &&
              side("before", c).isNull, 1L).otherwise(0L))).as(s"__dnulls_$c")) ++
          (if (mm(c)) Seq(
            min(when(col("change_type") =!= "delete", side("after", c)))
              .as(s"__min_$c"),
            max(when(col("change_type") =!= "delete", side("after", c)))
              .as(s"__max_$c"),
            // did this window remove a row holding a current bound?
            max(when(col("change_type") =!= "insert" &&
              (side("before", c) === cur.cols(c).min.getOrElse(Long.MinValue) ||
                side("before", c) === cur.cols(c).max.getOrElse(Long.MaxValue)),
              1L).otherwise(0L)).as(s"__bnd_$c"))
           else Nil) ++
          (if (nd(c)) Seq(
            hll_sketch_agg(when(col("change_type") =!= "delete", side("after", c)))
              .as(s"__ndv_$c"),
            sum(when(col("change_type") === "delete" ||
              (col("change_type") === "update" &&
                !(side("before", c) <=> side("after", c))), 1L).otherwise(0L))
              .as(s"__stale_$c"))
           else Nil)
      }
    val r = ch.agg(aggs.head, aggs.tail: _*).head()
    // merge the window sketch into the stored one driver-side (both
    // are bounded sketch blobs — the codebook class); hll_union is
    // null-tolerant on neither side, so guard empties
    def unioned(c: String): Option[Array[Byte]] = {
      val w = Option(r.getAs[Array[Byte]](s"__ndv_$c"))
      (cur.cols(c).ndv, w) match {
        case (Some(a), Some(b)) =>
          Some(spark.range(1)
            .select(hll_union(lit(a), lit(b)).as("u")).head().getAs[Array[Byte]]("u"))
        case (a, b) => b.orElse(a)
      }
    }
    // insert-window quantile sketches: same union-only, stale-on-delete
    // contract as the NDV sketch (KLL cannot subtract either)
    def quantUnioned(c: String): Option[Array[Byte]] = {
      val w = graft.functions.KllQuantiles.sketchOf(
        ch.filter(col("change_type") =!= "delete").select(side("after", c).as(c)),
        col(c))
      (cur.cols(c).quant, w) match {
        case (Some(a), Some(b)) => Some(graft.functions.KllQuantiles.merge(a, b))
        case (a, b) => b.orElse(a)
      }
    }
    val t = TableStats(cur.version + 1, m.version,
      cur.rows + r.getAs[Long]("__drows"),
      cols.map { c =>
        val p = cur.cols(c)
        val boundRemoved = mm(c) && r.getAs[Long](s"__bnd_$c") == 1L
        c -> ColStats(
          p.nulls + r.getAs[Long](s"__dnulls_$c"),
          if (mm(c)) Seq(p.min,
            Option(r.getAs[java.lang.Long](s"__min_$c")).map(_.longValue))
            .flatten.reduceOption(_ min _) else None,
          if (mm(c)) Seq(p.max,
            Option(r.getAs[java.lang.Long](s"__max_$c")).map(_.longValue))
            .flatten.reduceOption(_ max _) else None,
          p.minmaxExact && !boundRemoved,
          if (nd(c)) unioned(c) else None,
          p.staleDeletes + (if (nd(c)) r.getAs[Long](s"__stale_$c") else 0L),
          if (mm(c)) quantUnioned(c) else None)
      }.toMap)
    AtomicPublish.publishNoOverwrite(fsOf(spark, statsDir),
      statsPath(statsDir, t.version), body(t))
    t
  }
}
