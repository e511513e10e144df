package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` within the same
  * key group (backward as-of, inclusive), left-outer semantics.
  *
  * Spark has no native as-of join. Instead of the naive
  * `join(key && rTime <= lTime)` + keep-latest (which explodes to
  * O(|L|·|R|) per key before pruning), this uses the union+window
  * formulation: tag both sides, union, and for each left row take the
  * last right value at-or-before it via a running `last(ignoreNulls)`
  * over (key) ordered by (time, side).
  *
  * Scale: ONE shuffle on the key columns and a per-partition sort —
  * O((|L|+|R|) log) total, skew-tolerant via AQE; this is the plan
  * you'd want at 100 TB (the naive theta-join shape is quadratic per
  * hot key). Tie-break at equal timestamps: right rows sort before
  * left rows (inclusive <=), multiple right rows at the same instant
  * resolve to the one latest in `tieBreak` order.
  */
object AsofJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side — its columns are emitted
    *                  with prefix `rightPrefix`
    * @param keys      equi-join key column names (same names both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightCols right columns to carry (besides keys/time)
    * @param tieBreak  right column ordering the winner among equal
    *                  timestamps (max wins); must be non-null on right
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tieBreak: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    val carried = (rightCols :+ rightTime).distinct
    val leftCols = left.columns.toSeq

    val taggedLeft = carried.foldLeft(left.withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }.withColumn("__t", col(leftTime))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))

    val taggedRight = {
      val base = right.select((keys.map(col) ++ carried.map(c => col(c).as(s"__r_$c"))): _*)
        .withColumn("__side", lit(0))
        .withColumn("__t", col(s"__r_$rightTime"))
        .withColumn("__tie", col(s"__r_$tieBreak"))
      // align to left's full schema: left-only columns become nulls
      leftCols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unioned = taggedLeft.unionByName(taggedRight.select(taggedLeft.columns.map(col): _*))

    // right rows (side=0) sort before left rows at equal time → inclusive;
    // among right ties the greater tieBreak value is seen last and wins.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry ALL right columns in ONE struct so last(ignoreNulls) picks
    // them atomically from the same right row — per-column last() would
    // tear rows apart whenever a carried right column contains NULLs
    // (the struct is non-null exactly on right rows).
    val packed = unioned.withColumn("__r_struct",
      when(col("__side") === 0,
        struct(carried.map(c => col(s"__r_$c").as(c)): _*)))
    val withAsof = packed.withColumn("__asof",
      last(col("__r_struct"), ignoreNulls = true).over(w))

    withAsof
      .filter($"__side" === 1)
      .select((leftCols.map(col) ++
        carried.map(c => col(s"__asof.$c").as(s"${rightPrefix}$c"))): _*)
  }

  /** FORWARD as-of join: for each left row, the single right row with
    * the SMALLEST `rightTime >= leftTime` within the key group
    * (inclusive, left-outer) — "the next reading at-or-after this
    * event", the lookahead twin of [[asofBackward]] (label joins,
    * next-quote attribution). Same ONE-shuffle union+window shape,
    * mirrored: the frame runs (currentRow, unboundedFollowing), right
    * rows sort AFTER left rows at equal timestamps (so a same-instant
    * right qualifies under >=), and among equal-timestamp right rows
    * the SMALLEST `tieBreak` wins (`first` sees it first — the mirror
    * of backward's max-wins). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tieBreak: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    val carried = (rightCols :+ rightTime).distinct
    val leftCols = left.columns.toSeq

    val taggedLeft = carried.foldLeft(left.withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }.withColumn("__t", col(leftTime))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))

    val taggedRight = {
      val base = right.select((keys.map(col) ++ carried.map(c => col(c).as(s"__r_$c"))): _*)
        .withColumn("__side", lit(1))
        .withColumn("__t", col(s"__r_$rightTime"))
        .withColumn("__tie", col(s"__r_$tieBreak"))
      leftCols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unioned = taggedLeft.unionByName(taggedRight.select(taggedLeft.columns.map(col): _*))

    // left rows (side=0) sort before right rows at equal time →
    // inclusive >=; among right ties the smaller tieBreak is seen
    // first by `first` and wins.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val packed = unioned.withColumn("__r_struct",
      when(col("__side") === 1,
        struct(carried.map(c => col(s"__r_$c").as(c)): _*)))
    val withAsof = packed.withColumn("__asof",
      first(col("__r_struct"), ignoreNulls = true).over(w))

    withAsof
      .filter($"__side" === 0)
      .select((leftCols.map(col) ++
        carried.map(c => col(s"__asof.$c").as(s"${rightPrefix}$c"))): _*)
  }

  /** NEAREST as-of join: for each left row, the right row minimizing
    * |rightTime − leftTime| within the key group (left-outer) — the
    * third member of the as-of family (backward = latest at-or-before,
    * forward = earliest at-or-after, nearest = whichever is closer).
    * Ties in distance (including the same-instant case, where both
    * directions see the row) resolve BACKWARD — the convention that
    * degrades gracefully to plain backward as-of when the right side
    * stops early. Composition: one backward pass then one forward pass
    * (each the ONE-shuffle union+window shape, same key partitioning,
    * so the second pass reuses the exchange), then a per-row pick.
    * Distances are computed in exact integer space — microseconds for
    * timestamps, the raw value for integral time columns — never
    * floats (a timestamp→double cast loses sub-second bits and can
    * flip a near-tie, which an oracle on another engine would catch). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tieBreak: String,
      rightPrefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    def asMicros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        // NTZ reinterprets through LTZ in the session zone — this repo
        // pins UTC (GraftSession/SparkSpec), so the instant is exact
        case TimestampType | TimestampNTZType =>
          unix_micros(c.cast(TimestampType))
        case _ => c.cast(LongType)
      }
    val carried = (rightCols :+ rightTime).distinct
    val b = asofBackward(left, right, keys, leftTime, rightTime,
      rightCols, tieBreak, "__b_")
    val bf = asofForward(b, right, keys, leftTime, rightTime,
      rightCols, tieBreak, "__f_")
    val lt = asMicros(col(leftTime), left.schema(leftTime).dataType)
    val bT = asMicros(col(s"__b_$rightTime"), right.schema(rightTime).dataType)
    val fT = asMicros(col(s"__f_$rightTime"), right.schema(rightTime).dataType)
    val useB = fT.isNull || (bT.isNotNull && (lt - bT) <= (fT - lt))
    bf.select(left.columns.map(col) ++ carried.map(c =>
      when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c"))
        .as(s"$rightPrefix$c")): _*)
  }

  /** Reference implementation via theta-join + keep-latest window.
    * O(matches) blow-up — for tests and small sides only; exists to
    * cross-check asofBackward semantics. */
  def asofBackwardNaive(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      tieBreak: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val carried = (rightCols :+ rightTime).distinct
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val rSel = right.select(
      (keys.map(k => col(k).as(s"__rk_$k")) ++ carried.map(c => col(c).as(s"${rightPrefix}$c"))): _*)
    val cond = keys.map(k => l(k) === rSel(s"__rk_$k")).reduce(_ && _) &&
      rSel(s"${rightPrefix}$rightTime") <= l(leftTime)
    val joined = l.join(rSel, cond, "left")
    val w = Window.partitionBy($"__lid")
      .orderBy(col(s"${rightPrefix}$rightTime").desc_nulls_last,
        col(s"${rightPrefix}$tieBreak").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
      .select((left.columns.map(col) ++ carried.map(c => col(s"${rightPrefix}$c"))): _*)
  }
}
