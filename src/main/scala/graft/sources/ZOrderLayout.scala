package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering for TWO-dimensional data
  * skipping — the layout rung single-column clustering cannot reach.
  * A linear sort on column A gives tight per-file min/max on A and
  * useless (full-range) stats on B; interleaving the bits of both
  * columns' quantile-rank codes makes file locality track BOTH
  * dimensions at once, so a predicate box on (A, B) — or on B alone —
  * intersects O(few) files' stat ranges instead of all of them. This
  * is the published Delta/Databricks OPTIMIZE ZORDER design point,
  * rebuilt on public Spark primitives.
  *
  * Scale shape: rank codes come from APPROXIMATE quantile split
  * points (one distributed percentile_approx agg per column,
  * 2^bits−1 doubles collected — bounded driver state, the
  * planChunkBounds class), applied as a broadcast literal fold
  * (the rangeBucketOf pattern — codegen'd, no shuffle); the Morton
  * interleave is pure bit arithmetic on those codes; the only
  * exchange is the final repartitionByRange on the z-value (a range
  * shuffle ANY clustered write pays), and files are written sorted
  * within partitions so parquet row-group stats inherit the
  * clustering. Nothing windows globally, nothing collects data rows.
  *
  * Approximation honesty: quantile error only SKEWS CODE BOUNDARIES
  * — a misplaced split point degrades clustering quality (reads
  * prune a little less), never correctness, because reads always
  * re-filter exactly; the spec asserts pruning factors with planted
  * skew, not exact file counts. */
object ZOrderLayout {

  /** Morton-interleave two `bits`-wide non-negative codes (a gets the
    * odd bit positions, b the even) — the N=2 case of [[interleave]],
    * kept as the named classic. */
  def morton(a: Column, b: Column, bits: Int): Column =
    interleave(Seq(a, b), bits)

  /** Round-robin bit interleave of N `bits`-wide non-negative codes —
    * the N-column z-value (r16 verdict #6: Delta accepts arbitrary
    * ZORDER arity; 3–4-column clustering keys are common). Output bit
    * position `i*n + (n-1-j)` takes bit `i` of code `j`: within each
    * round the EARLIER column lands on the MORE significant bit, so
    * `interleave(Seq(a, b), bits)` reproduces [[morton]] exactly and
    * the 2-column behavior (and its committed file layouts) is
    * unchanged. Pure bit arithmetic on codegen'd long ops — no UDF,
    * no shuffle; `n * bits` must fit a positive long (≤ 63 bits). */
  def interleave(codes: Seq[Column], bits: Int): Column = {
    val n = codes.size
    require(n >= 1, "interleave needs at least one code")
    require(n * bits <= 63,
      s"$n columns at $bits bits each = ${n * bits} z-bits — exceeds a " +
        "long; lower bits or the column count")
    (0 until bits).flatMap { i =>
      codes.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Quantile-rank code in [0, 2^bits): count of split points at or
    * below the (long-cast) value — rangeBucketOf's literal fold over
    * the broadcast splits. */
  def rankCode(c: Column, splits: Seq[Long]): Column =
    graft.ops.cdc.PartitionedUpsert.rangeBucketOf(c, splits)

  /** Distinct sorted interior split points giving ≤ 2^bits quantile
    * buckets for `col` (numeric; long-cast like every range router
    * here). Approximate by design — see the scaladoc honesty note. */
  def planSplits(df: DataFrame, colName: String, bits: Int): Seq[Long] =
    planSplitsN(df, Seq(colName), bits).head

  /** ALL columns' split points from ONE distributed agg pass —
    * whatever the arity, split planning costs one scan. Bounded
    * driver state: N × (2^bits − 1) doubles. */
  def planSplitsN(df: DataFrame, cols: Seq[String],
                  bits: Int): Seq[Seq[Long]] = {
    val n = (1 << bits) - 1
    val qs = array((1 to n).map(i => lit(i.toDouble / (1 << bits))): _*)
    val row = df.select(cols.zipWithIndex.map { case (c, i) =>
      percentile_approx(col(c).cast("double"), qs, lit(10000)).as(s"q$i")
    }: _*).collect()(0)
    cols.indices.map { i =>
      if (row.isNullAt(i)) Seq.empty // all-null column: one flat code
      else row.getSeq[Double](i).map(math.floor(_).toLong).distinct.sorted
    }
  }

  private def planSplits2(df: DataFrame, colA: String, colB: String,
                          bits: Int): (Seq[Long], Seq[Long]) = {
    val s = planSplitsN(df, Seq(colA, colB), bits)
    (s(0), s(1))
  }

  /** Write `df` under `dir` clustered on the z-curve of (colA, colB):
    * `numFiles` range partitions of the z-value, rows sorted by it
    * within each, one parquet file per partition. Returns the split
    * points used (callers wanting to route reads the same way). The
    * input is PINNED across split planning and the write (the
    * PartitionedUpsert.initWith rule: an unpersisted non-deterministic
    * pipeline would re-evaluate per action and the splits could
    * describe a different sample than the rows written — clustering
    * quality, not correctness, but silent), and both columns' split
    * points come from ONE agg pass, so the input evaluates twice
    * (plan + write), not three times. */
  def write(df: DataFrame, dir: String, colA: String, colB: String,
            numFiles: Int, bits: Int = 8): (Seq[Long], Seq[Long]) = {
    // pin only if the caller hasn't already — unconditional
    // persist/unpersist here would silently drop a cache the caller
    // set up for its own reuse
    val wePinned = df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val pinned = if (wePinned) df.persist() else df
    try {
      val (sa, sb) = planSplits2(pinned, colA, colB, bits)
      val z = morton(rankCode(col(colA), sa), rankCode(col(colB), sb), bits)
      pinned.withColumn("__z", z)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(dir)
      (sa, sb)
    } finally { if (wePinned) df.unpersist(); () }
  }

  /** Per-file (min, max) of a column across the parquet files under
    * `dir` — the stats a box-predicate reader prunes with (parquet
    * footers carry the same ranges; this derives them portably for
    * specs and for planners that cache stats table-side). */
  def fileRanges(spark: SparkSession, dir: String, colName: String)
      : Map[String, (Long, Long)] =
    fileRanges2(spark, dir, colName, colName)
      .map { case (f, (mn, mx, _, _)) => f -> (mn, mx) }

  /** Per-file (min, max) of BOTH columns in ONE scan. */
  private def fileRanges2(spark: SparkSession, dir: String,
                          colA: String, colB: String)
      : Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(colA).cast("long")).as("amn"),
        max(col(colA).cast("long")).as("amx"),
        min(col(colB).cast("long")).as("bmn"),
        max(col(colB).cast("long")).as("bmx"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (f, amn, amx, bmn, bmx) => f -> (amn, amx, bmn, bmx) }
      .toMap
  }

  /** Files whose [min, max] on BOTH columns intersect the box —
    * what a stats-pruning scan of the box predicate would read.
    * One scan gathers both columns' ranges. */
  def filesForBox(spark: SparkSession, dir: String,
                  colA: String, loA: Long, hiA: Long,
                  colB: String, loB: Long, hiB: Long): Seq[String] = {
    fileRanges2(spark, dir, colA, colB).toSeq.collect {
      case (f, (amn, amx, bmn, bmx))
        if !(amx < loA || amn > hiA) && !(bmx < loB || bmn > hiB) => f
    }.sorted
  }

  /** Count of data files under `dir`. */
  def fileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }
}
