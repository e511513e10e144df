package graft.ops.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Incremental maintenance of grouped MIN/MAX — the aggregate family
  * member [[AggMaintain]]'s scaladoc deliberately excludes, because
  * extremes do not compose from deltas: a deleted row may have BEEN
  * the max, and recomputing its group from nothing but ± images is
  * impossible. The standard answer (materialized-view literature calls
  * it a "reserve" or "top-k synopsis") is maintained here: per group
  * and measure, keep the top-K and bottom-K DISTINCT values with their
  * EXACT multiplicities, plus a watermark recording where the reserve
  * was truncated.
  *
  * The invariant that makes deletes exact: the high reserve contains
  * exactly the group's distinct values STRICTLY ABOVE the floor
  * watermark (`hif_c`), each with its true multiplicity; `hif_c` null
  * means the reserve covers the whole group. Then
  *  - an insert of v > floor lands in the reserve (exact increment);
  *    v ≤ floor is a tail insert the reserve provably doesn't need;
  *  - a delete of v > floor MUST find its reserve entry (decrement);
  *    v ≤ floor is a tail delete — also invisible to the max;
  *  - truncation (reserve grown past K distinct values) keeps the top
  *    K and raises the floor to the (K+1)-th value — the invariant is
  *    re-established, never approximated.
  * The max is therefore EXACT whenever the reserve is non-empty. Only
  * when a group loses ALL K reserve values while still holding rows
  * (K+1 extreme-deletes since the last rebuild) is the max unknown —
  * the group is flagged `needs_rescan` and [[rescanMerge]] rebuilds it
  * from the source, restricted by semi-join to EXACTLY the flagged
  * groups. Nothing is ever silently wrong: between [[deltaMinMax]] and
  * [[rescanMerge]] the flag is the contract.
  *
  * Scale shape: the delta step shuffles (group, value) pairs sized by
  * the CHANGE WINDOW plus K·groups touched — never the table; its
  * per-group window ranks reserve-plus-window value sets (≤ K + window
  * rows per group). The one O(source) pass is [[fullMinMaxState]]
  * (seeding — same lifecycle position as AggMaintain.initAggregate);
  * rescans re-run it over only the flagged groups' rows. K is the dial
  * trading reserve bytes (K longs per group-side) against rescan
  * frequency.
  */
object MinMaxMaintain {

  /** Maintained columns for one measure c: non-null count `n_c`, high
    * reserve `hi_c` (array of (v, m) structs, v descending), its floor
    * `hif_c`, low reserve `lo_c` (v ascending), its ceiling `loc_c`. */
  def stateCols(cols: Seq[String]): Seq[String] =
    "cnt" +: cols.flatMap(c =>
      Seq(s"n_$c", s"hi_$c", s"hif_$c", s"lo_$c", s"loc_$c"))

  private val entryType = ArrayType(StructType(Seq(
    StructField("v", LongType), StructField("m", LongType))))

  private def nullSafeOn(left: DataFrame, right: DataFrame,
                         groupCols: Seq[String]): Column =
    groupCols.map(g => left(g) <=> right(g)).reduce(_ && _)

  /** Rename a frame's group columns to `__rg_<g>` so joining it back
    * onto a frame sharing its lineage (the prior state and the change
    * window both derive from the same source plans) can never hit the
    * ambiguous-attribute trap. */
  private def rgPrefixed(df: DataFrame, groupCols: Seq[String]): DataFrame =
    groupCols.foldLeft(df)((d, g) => d.withColumnRenamed(g, s"__rg_$g"))

  private def rgJoinOn(left: DataFrame, right: DataFrame,
                       groupCols: Seq[String]): Column =
    groupCols.map(g => left(g) <=> right(s"__rg_$g")).reduce(_ && _)

  /** Top-K (hi) or bottom-K (lo) distinct-value reserve per group from
    * a (group..., v, m) multiplicity frame: (group..., arr, crossing)
    * where `crossing` is the (K+1)-th distinct value when truncation
    * occurred, else null. The rank window partitions per group, so
    * groups proceed in parallel; in the delta step its input is
    * reserve+window-sized, never table-sized. */
  private def reserveSide(entries: DataFrame, groupCols: Seq[String],
                          k: Int, hi: Boolean): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(if (hi) col("v").desc else col("v").asc)
    entries.withColumn("__rn", row_number().over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sort_array(collect_list(when(col("__rn") <= k,
          struct(col("v"), col("m")))), asc = !hi).as("arr"),
        // exactly one row carries rank k+1, so max() just extracts it
        max(when(col("__rn") === k + 1, col("v"))).as("crossing"))
  }

  /** Seed: full min/max reserve state of `state` — the only step whose
    * reads are sized by the source (the AggMaintain.initAggregate
    * lifecycle position). Measures must be integral (LongType — the
    * integer-cents convention StatsMaintain's min/max also uses). */
  def fullMinMaxState(state: DataFrame, groupCols: Seq[String],
                      cols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"reserve size must be >= 1, got $k")
    cols.foreach { c =>
      require(state.schema(c).dataType == LongType,
        s"measure '$c' must be LongType (integer units) — " +
          s"got ${state.schema(c).dataType}")
    }
    val base = state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1L)).as("cnt"),
        cols.map(c => count(col(c)).as(s"n_$c")): _*)
    cols.foldLeft(base) { (acc, c) =>
      val vc = state.filter(col(c).isNotNull)
        .groupBy((groupCols.map(col) :+ col(c).as("v")): _*)
        .agg(count(lit(1L)).as("m"))
      val hiF = rgPrefixed(reserveSide(vc, groupCols, k, hi = true)
        .withColumnRenamed("arr", s"hi_$c")
        .withColumnRenamed("crossing", s"hif_$c"), groupCols)
      val loF = rgPrefixed(reserveSide(vc, groupCols, k, hi = false)
        .withColumnRenamed("arr", s"lo_$c")
        .withColumnRenamed("crossing", s"loc_$c"), groupCols)
      val j1 = acc.join(hiF, rgJoinOn(acc, hiF, groupCols), "left")
        .select(acc.columns.map(acc(_)) ++
          Seq(coalesce(hiF(s"hi_$c"), array().cast(entryType))
            .as(s"hi_$c"), hiF(s"hif_$c")): _*)
      j1.join(loF, rgJoinOn(j1, loF, groupCols), "left")
        .select(j1.columns.map(j1(_)) ++
          Seq(coalesce(loF(s"lo_$c"), array().cast(entryType))
            .as(s"lo_$c"), loF(s"loc_$c")): _*)
    }
  }

  /** Compose an image-diff change window ([[AggMaintain.diffImages]]
    * output) onto a prior reserve state — full-outer over groups, so
    * untouched groups pass through and new groups materialize. Output
    * carries `needs_rescan`: true iff some reserve emptied while the
    * group still holds non-null values (its extreme is unknown until
    * [[rescanMerge]]). Groups whose row count reaches zero vanish, as
    * from a direct aggregate. */
  def deltaMinMax(prior: DataFrame, changes: DataFrame,
                  groupCols: Seq[String], cols: Seq[String],
                  k: Int): DataFrame =
    deltaMinMaxAll(prior, changes, groupCols, cols, k)
      .filter(col("cnt") > 0)

  /** [[deltaMinMax]] WITHOUT dropping vanished groups — the
    * table-backed maintenance path needs cnt ≤ 0 rows as delete ops
    * (the AggMaintain.mergedRows convention). */
  private def deltaMinMaxAll(prior: DataFrame, changes: DataFrame,
                             groupCols: Seq[String], cols: Seq[String],
                             k: Int): DataFrame = {
    require(k >= 1, s"reserve size must be >= 1, got $k")
    // cnt and per-measure non-null counts ride AggMaintain's exact
    // delta algebra; its s_ sums are computed and dropped
    val cn = AggMaintain.deltaAggregate(changes, groupCols, cols)
      .drop(cols.map(c => s"s_$c"): _*)
    val d = cn.select(cn.columns.toSeq.map(c =>
      cn(c).as(if (c == "cnt" || c.startsWith("n_")) s"__d_$c"
               else s"__g_$c")): _*)
    val joined = prior.join(d,
      groupCols.map(g => prior(g) <=> d(s"__g_$g")).reduce(_ && _),
      "full_outer")
    val base = joined.select(
      groupCols.map(g => coalesce(prior(g), d(s"__g_$g")).as(g)) ++
        Seq((coalesce(prior("cnt"), lit(0L)) +
          coalesce(d("__d_cnt"), lit(0L))).as("cnt")) ++
        cols.flatMap(c => Seq(
          (coalesce(prior(s"n_$c"), lit(0L)) +
            coalesce(d(s"__d_n_$c"), lit(0L))).as(s"n_$c"),
          coalesce(prior(s"hi_$c"), array().cast(entryType))
            .as(s"hi_$c"),
          prior(s"hif_$c").as(s"hif_$c"),
          coalesce(prior(s"lo_$c"), array().cast(entryType))
            .as(s"lo_$c"),
          prior(s"loc_$c").as(s"loc_$c"))): _*)

    // ± value contributions per measure, from the same before(-1) /
    // after(+1) explosion deltaAggregate uses
    def contribs(c: String): DataFrame =
      changes.select(explode(array(
          struct(lit(-1L).as("__sign"), col("before").as("__img")),
          struct(lit(1L).as("__sign"), col("after").as("__img")))).as("x"))
        .filter(col("x.__img").isNotNull && col(s"x.__img.$c").isNotNull)
        .select(groupCols.map(g => col(s"x.__img.$g").as(g)) ++
          Seq(col(s"x.__img.$c").as("v"), col("x.__sign").as("m")): _*)

    val out = cols.foldLeft(base) { (acc, c) =>
      val cf = contribs(c)
      def side(hi: Boolean): DataFrame = {
        val (arrCol, bndCol) = if (hi) (s"hi_$c", s"hif_$c")
                               else (s"lo_$c", s"loc_$c")
        val priorEntries = prior.select(
          groupCols.map(col) :+ explode(col(arrCol)).as("e"): _*)
          .select(groupCols.map(col) :+ col("e.v").as("v") :+
            col("e.m").as("m"): _*)
        // contributions at or beyond the watermark are tail events the
        // reserve provably doesn't need; watermark comes from prior
        // (absent group -> null -> keep everything)
        val bnd = rgPrefixed(prior.select(groupCols.map(col) :+
          col(bndCol).as("__bnd"): _*), groupCols)
        val inReserve = cf.join(bnd, rgJoinOn(cf, bnd, groupCols), "left")
          .filter(col("__bnd").isNull ||
            (if (hi) col("v") > col("__bnd") else col("v") < col("__bnd")))
          .select(groupCols.map(col) :+ col("v") :+ col("m"): _*)
        val entries = priorEntries.unionByName(inReserve)
          .groupBy((groupCols.map(col) :+ col("v")): _*)
          .agg(sum(col("m")).as("m"))
          .filter(col("m") > 0)
        rgPrefixed(reserveSide(entries, groupCols, k, hi)
          .withColumnRenamed("arr", s"__new_$arrCol")
          .withColumnRenamed("crossing", s"__cross_$arrCol"), groupCols)
      }
      Seq(true, false).foldLeft(acc) { (a, hi) =>
        val (arrCol, bndCol) = if (hi) (s"hi_$c", s"hif_$c")
                               else (s"lo_$c", s"loc_$c")
        val s = side(hi)
        a.join(s, rgJoinOn(a, s, groupCols), "left")
          .select(a.columns.toSeq.filterNot(x =>
              x == arrCol || x == bndCol).map(a(_)) ++ Seq(
            // a matched group always has >= 1 ranked row, so its arr is
            // the truth; an unmatched group either kept an empty
            // reserve or had it fully cancelled this window
            coalesce(s(s"__new_$arrCol"),
              array().cast(entryType)).as(arrCol),
            // truncation this step raises the watermark; otherwise it
            // stands (entries were all strictly beyond the old one)
            coalesce(s(s"__cross_$arrCol"), a(bndCol)).as(bndCol)): _*)
      }
    }
    val rescan = cols.map(c =>
      (size(col(s"hi_$c")) === 0 && col(s"n_$c") > 0) ||
        (size(col(s"lo_$c")) === 0 && col(s"n_$c") > 0))
      .reduce(_ || _)
    out.withColumn("needs_rescan", rescan)
  }

  /** Resolve the flagged groups of a [[deltaMinMax]] result by
    * rebuilding them from `source` (the maintained table's CURRENT
    * full state) — the read is semi-join-restricted to exactly the
    * flagged groups, so its OUTPUT is sized by them; with K sized
    * sanely the flag fires only on groups that lost K+1 extremes in
    * one window. Clean rows pass through untouched. */
  def rescanMerge(state: DataFrame, source: DataFrame,
                  groupCols: Seq[String], cols: Seq[String],
                  k: Int): DataFrame = {
    val dirty = rgPrefixed(state.filter(col("needs_rescan"))
      .select(groupCols.map(col): _*), groupCols)
    val scoped = source.join(broadcast(dirty),
      rgJoinOn(source, dirty, groupCols), "left_semi")
    fullMinMaxState(scoped, groupCols, cols, k)
      .unionByName(state.filter(!col("needs_rescan"))
        .drop("needs_rescan"))
  }

  /** SQL-semantics view: per measure, `min_c`/`max_c` are the reserve
    * heads (NULL when the group has no non-null values — exactly what
    * direct min/max yield). Requires a clean state (no pending
    * `needs_rescan` — run [[rescanMerge]] first); reading a flagged
    * row here would be silently wrong, so the column's absence is
    * enforced. */
  def exposedMinMax(state: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame = {
    require(!state.columns.contains("needs_rescan"),
      "state carries unresolved needs_rescan flags — rescanMerge first")
    state.select(groupCols.map(col) ++ (col("cnt") +: cols.flatMap(c => Seq(
      when(col(s"n_$c") > 0, element_at(col(s"lo_$c"), 1).getField("v"))
        .as(s"min_$c"),
      when(col(s"n_$c") > 0, element_at(col(s"hi_$c"), 1).getField("v"))
        .as(s"max_$c")))): _*)
  }

  /** Maintained grouped TOP-N view over the high reserve: per group,
    * the n largest distinct values of `c` with their EXACT
    * multiplicities, ranked 1..n — the dashboard top-N list, delta-
    * maintained. Exact by the reserve invariant (the reserve holds
    * exactly the distinct values strictly above the watermark, fully
    * multiplied), provided n ≤ the K the state was maintained with —
    * that bound is the CALLER's contract (K is not recorded in the
    * state; the invariant is K-independent). Groups with fewer than n
    * distinct values emit fewer rows, like a direct ranked window.
    * Requires a clean state (no pending `needs_rescan`), same as
    * [[exposedMinMax]]. */
  def exposedTopK(state: DataFrame, groupCols: Seq[String], c: String,
                  n: Int): DataFrame = {
    require(n >= 1, s"top-n size must be >= 1, got $n")
    require(!state.columns.contains("needs_rescan"),
      "state carries unresolved needs_rescan flags — rescanMerge first")
    state.select(groupCols.map(col) :+
        posexplode(slice(col(s"hi_$c"), 1, n)): _*)
      .withColumnRenamed("pos", "__i")
      .select(groupCols.map(col) ++ Seq(
        (col("__i") + 1).cast(LongType).as("rnk"),
        col("col.v").as("v"), col("col.m").as("m")): _*)
  }

  // -------------------------------------------------------------------
  // Table-backed maintenance: mmDir is a PartitionedUpsert target keyed
  // by gkey = struct(groupCols), maintained from sourceDir's CDF with
  // the last-applied source version in the manifest's transaction map —
  // the AggMaintain lifecycle, with the reserve columns riding along as
  // ordinary (nested) value columns. A maintenance step reads: the
  // window's changed source buckets (manifest diff), the aggregate
  // buckets the touched groups hash to (readForKeys), and — ONLY when a
  // reserve exhausted — the pinned source state filtered to the flagged
  // groups. That last read is the honest cost of non-invertible
  // aggregates: it scans the source once but emits only the flagged
  // groups' rows, and K dials how rarely it happens (a group must lose
  // K+1 extremes in one window). Everything else is sized by the change
  // set.
  // -------------------------------------------------------------------

  private def srcApp(sourceDir: String): String =
    PartitionedUpsert.cdfApp(sourceDir)

  private def gkeyOf(groupCols: Seq[String]): Column =
    struct(groupCols.map(col): _*)

  /** Group/measure spec recovered from the maintained schema (the
    * AggMaintain.specOf convention): groups = gkey fields, measures =
    * `n_<c>` survivors. K need not be recorded: the reserve invariant
    * (exactly the values beyond the watermark) is independent of K —
    * a later step with a different K merely truncates differently. */
  private def specOf(schema: StructType): (Seq[String], Seq[String]) = {
    val groupCols = schema("gkey").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq
    val cols = schema.fieldNames.toSeq.collect {
      case s if s.startsWith("n_") => s.stripPrefix("n_")
    }
    (groupCols, cols)
  }

  /** Seed the maintained min/max table from the source's current
    * committed state (pinned to the recorded version — the
    * initAggregate double-apply guard). */
  def initMinMax(spark: org.apache.spark.sql.SparkSession,
                 sourceDir: String, mmDir: String,
                 groupCols: Seq[String], cols: Seq[String],
                 k: Int, nBuckets: Int): Long = {
    groupCols.foreach(g => require(
      g != "cnt" && !g.startsWith("n_") && !g.startsWith("hi_") &&
        !g.startsWith("hif_") && !g.startsWith("lo_") && !g.startsWith("loc_"),
      s"group column '$g' collides with the maintained measure naming"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val state = fullMinMaxState(
        PartitionedUpsert.readVersion(spark, sourceDir, sm.version),
        groupCols, cols, k)
      .withColumn("gkey", gkeyOf(groupCols))
    PartitionedUpsert.init(state, mmDir, "gkey", nBuckets,
      txn = Some((srcApp(sourceDir), sm.version)))
    sm.version
  }

  /** The maintained table's exposed min/max view. */
  def readMinMax(spark: org.apache.spark.sql.SparkSession,
                 mmDir: String): DataFrame = {
    val m = PartitionedUpsert.currentManifest(spark, mmDir).getOrElse(
      throw new IllegalStateException(
        s"$mmDir is not an initialized upsert target"))
    val (groupCols, cols) = specOf(m.schema)
    exposedMinMax(PartitionedUpsert.read(spark, mmDir), groupCols, cols)
  }

  /** Advance the maintained min/max to the source's current (or
    * pinned) version from the CDF window. Same idempotence and
    * concurrent-maintainer contract as AggMaintain.maintainAggregate:
    * txn (cdf:<sourceDir>, toVersion) makes replays metadata no-ops;
    * a lost publish race retries once from fresh manifests. */
  def maintainMinMax(spark: org.apache.spark.sql.SparkSession,
                     sourceDir: String, mmDir: String, k: Int,
                     toVersion: Option[Long] = None): (Long, Long) =
    try attemptMaintain(spark, sourceDir, mmDir, k, toVersion)
    catch {
      case _: java.util.ConcurrentModificationException =>
        attemptMaintain(spark, sourceDir, mmDir, k, toVersion)
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("is already applied") =>
        attemptMaintain(spark, sourceDir, mmDir, k, toVersion)
    }

  private def attemptMaintain(spark: org.apache.spark.sql.SparkSession,
                              sourceDir: String, mmDir: String, k: Int,
                              toVersion: Option[Long]): (Long, Long) = {
    val mm = PartitionedUpsert.currentManifest(spark, mmDir).getOrElse(
      throw new IllegalStateException(
        s"$mmDir is not an initialized upsert target"))
    val sm = PartitionedUpsert.currentManifest(spark, sourceDir).getOrElse(
      throw new IllegalStateException(
        s"$sourceDir is not an initialized upsert target"))
    val from = mm.txns.getOrElse(srcApp(sourceDir),
      throw new IllegalStateException(
        s"$mmDir does not maintain min/max of $sourceDir — " +
          s"initMinMax it first (txn key ${srcApp(sourceDir)} absent)"))
    val to = toVersion.getOrElse(sm.version)
    if (to <= from) return (from, from)
    val (groupCols, cols) = specOf(mm.schema)
    // pinned: the bucket collect in readForKeys and the merge must see
    // the same change rows (the AggMaintain persist rule)
    val changes = PartitionedUpsert
      .changesBetweenImages(spark, sourceDir, from, to).persist()
    try {
      if (changes.isEmpty) {
        PartitionedUpsert.recordTxn(spark, mmDir, srcApp(sourceDir), to)
        return (from, to)
      }
      val touchedKeys = changes.select(explode(array(
          col("before"), col("after"))).as("__img"))
        .filter(col("__img").isNotNull)
        .select(struct(groupCols.map(g => col(s"__img.$g").as(g)): _*)
          .as("gkey"))
        .distinct()
      // bucket-pruned prior rows, then narrowed to exactly the touched
      // groups (a bucket holds other groups too — rewriting them
      // identically would bloat the change log)
      val tk = touchedKeys.withColumnRenamed("gkey", "__tk")
      val prior = PartitionedUpsert.readForKeys(spark, mmDir,
          touchedKeys, "gkey")
        .join(broadcast(tk), col("gkey") <=> col("__tk"), "left_semi")
        .drop("gkey")
      val stepped = deltaMinMaxAll(prior, changes, groupCols, cols, k)
      // exhausted groups rebuild from the PINNED source state — scoped
      // by semi-join to the flagged groups; steps with no exhaustion
      // never touch the source beyond its CDF
      val resolved =
        if (stepped.filter(col("needs_rescan")).isEmpty)
          stepped.drop("needs_rescan")
        else {
          val vanished = stepped.filter(col("cnt") <= 0)
            .drop("needs_rescan")
          rescanMerge(stepped.filter(col("cnt") > 0),
            PartitionedUpsert.readVersion(spark, sourceDir, to),
            groupCols, cols, k).unionByName(vanished)
        }
      val changeLog = resolved.select(
        gkeyOf(groupCols).as("gkey") +:
          lit(to).as("lsn") +:
          when(col("cnt") <= 0, "d").otherwise("u").as("op") +:
          (groupCols ++ stateCols(cols)).map(col): _*)
      PartitionedUpsert.merge(spark, mmDir, changeLog, "gkey", "lsn", "op",
        groupCols ++ stateCols(cols), mm.nBuckets,
        txn = Some((srcApp(sourceDir), to)))
      (from, to)
    } finally { changes.unpersist(); () }
  }
}
