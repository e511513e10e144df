package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series resampling (§2 extension): regularize an event feed
  * onto a fixed hourly grid with gap-filling and forward-fill — the
  * standard densification step for CDC/sensor feeds before windowed
  * analytics.
  *
  * Scale notes: the grid is built per key from a sequence() explode
  * (rows = keys × slots, generated — not shuffled in), aggregated
  * events join onto it by (key, slot) and the forward fill is one
  * window pass. One shuffle on the key overall.
  */
object Resample {

  /** Hourly grid for users < 20 over the corpus time range, with
    * per-slot event counts and forward-filled last value. */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
      .filter($"user_id" < 20)
      .withColumn("slot", date_trunc("hour", $"ts"))
    val bounds = ev.agg(
      min($"slot").as("lo"), max($"slot").as("hi"))
    val grid = ev.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id",
        explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("slot"))
    val hourly = ev.groupBy($"user_id", $"slot")
      .agg(
        count(lit(1)).as("n_events"),
        max_by($"value", $"event_id").as("last_value"))
    val w = Window.partitionBy($"user_id").orderBy($"slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "slot"), "left")
      .select(
        $"user_id", $"slot",
        coalesce($"n_events", lit(0L)).as("n_events"),
        last($"last_value", ignoreNulls = true).over(w).as("ffill_value"))
      .orderBy($"user_id", $"slot")
  }

  /** Exponentially-decayed trailing activity score per event: the
    * last 8 amounts per user, each halved per step of age — the
    * recency-weighted feature every behavioral model starts from
    * (bounded-window EWMA). Decay 0.5 is deliberate: every weight is
    * a dyadic rational, so products and the running sum are EXACT in
    * doubles — zero cross-engine float drift by construction (the
    * integer-cents rule, extended to weights). Shape: one window pass
    * per user (the same (user, event_id) sort q_window_* share); the
    * trailing frame bounds state at 8 values per row. */
  def qTsDecay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.table(spark, dir, "events")
      .select($"user_id", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(-7, Window.currentRow)
    base.withColumn("trail", collect_list($"cents").over(w))
      .withColumn("n", size($"trail")) // materialized: lambda-inlining rule
      .select($"user_id", $"event_id",
        round(aggregate(
          transform($"trail", (x, i) => x * pow(lit(0.5), $"n" - 1 - i)),
          lit(0.0), (acc, x) => acc + x), 4).as("decayed"))
      .orderBy($"user_id", $"event_id")
  }

  /** Trailing z-score anomaly detection over the hourly series: each
    * (type, hour) bucket scored against the mean/stddev of its own
    * PRECEDING 24 hours (frame ends at -1 — the scored point never
    * contaminates its own baseline), flagged at |z| > 3. The standard
    * online monitor for an event feed. Engine-exact by the layered
    * rules: integer-cents measure, the flag derived from the ROUNDED z
    * on both sides (a boundary-straddling raw z cannot flip it), warmup
    * (<12 trailing points) and zero-variance windows excluded. Shape:
    * one (type, hour) shuffle for the rollup, then the three stacked
    * trailing windows share ONE Exchange + sort (same partition/order);
    * state per row is bounded by the 24-row frame. */
  /** Robust outlier detection (`q_ts_outlier_mad`) — the MAD flavor
    * complementing q_ts_anomaly's rolling z-score: median absolute
    * deviation is insensitive to the outliers it hunts (a single wild
    * hour inflates a stddev enough to hide itself — the classic
    * breakdown argument; MAD's breakdown point is 50%). Exactness:
    * the hourly series is integer cents, so both medians land on
    * k or k+0.5 EXACTLY (binary-representable), deviations are exact,
    * and 4.5·mad is exact (9·mad/2) — the flag comparison cannot
    * straddle float noise cross-engine. */
  def qTsOutlierMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      // the hour-grain rollup materializes ONCE (rows = types×hours,
      // tiny at any event volume): median, deviations, MAD and the
      // final score all read it — otherwise four event scans in one
      // plan (r14 multi-scan audit)
      .localCheckpoint()
    val med = hourly.groupBy($"event_type")
      .agg(percentile($"cents", lit(0.5)).as("m"))
    val d = hourly.join(broadcast(med), "event_type")
      .withColumn("dev", abs($"cents" - $"m"))
    val mads = d.groupBy($"event_type")
      .agg(percentile($"dev", lit(0.5)).as("mad"))
    d.join(broadcast(mads), "event_type")
      .filter($"mad" > 0)
      .select($"event_type", $"h", $"cents",
        round($"dev" / $"mad", 4).as("rz"),
        ($"dev" > lit(4.5) * $"mad").as("outlier"))
      .orderBy($"event_type", $"h")
  }

  def qTsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(-24, -1)
    val z = round(($"cents" - $"mu") / $"sd", 4)
    hourly
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("mu", avg($"cents").over(w))
      .withColumn("sd", stddev_samp($"cents").over(w))
      .filter($"nw" >= 12 && $"sd" > 0)
      .select($"event_type", $"h", $"cents", z.as("z"),
        (abs(z) > 3).as("anomaly"))
      .orderBy($"event_type", $"h")
  }

  /** CUSUM changepoint statistic over the daily series, in EXACT
    * integer arithmetic: the textbook S_i = Σ(x_j − mean) is scaled by
    * N (days in the series) so S_i = N·cum_i − i·T needs no float mean
    * — every value is a BIGINT, the peak flag is an exact integer
    * compare, zero cross-engine drift by construction (the
    * integer-cents rule extended to the mean-centered cumsum). The
    * argmax |S_i| day is the single-changepoint estimate (classic
    * offline CUSUM). Shape: one (type, day) rollup shuffle; the
    * ordered cumsum and the partition-wide N/T/max share the
    * per-type partitioning, and a series is tiny per key (one row per
    * day) no matter how many events fed it. */
  def qTsCusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val ord = Window.partitionBy($"event_type").orderBy($"d")
    val all = Window.partitionBy($"event_type")
    daily
      .withColumn("i", row_number().over(ord))
      .withColumn("cum", sum($"cents").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("t", sum($"cents").over(all))
      .withColumn("s", $"n" * $"cum" - $"i" * $"t")
      .withColumn("peak", abs($"s") === max(abs($"s")).over(all))
      .select($"event_type", $"d", $"cents", $"s", $"peak")
      .orderBy($"event_type", $"d")
  }

  /** Autocorrelation function of the hourly event-count series per
    * type, at lags {1,2,3,6,12,24} — the standard seasonality /
    * burstiness diagnostic (a daily cycle shows as a lag-24 peak). In
    * EXACT integer arithmetic end to end: with n = hours and T = Σx,
    * the mean-centered term (x_t − T/n) is scaled by n to y_t =
    * n·x_t − T (a BIGINT — the q_ts_cusum trick), so r_l =
    * Σ y_t·y_{t−l} / Σ y_t² is a ratio of two exact BIGINTs and the
    * n² scaling cancels; one double division, rounded 4 dp — zero
    * cross-engine drift by construction. Shape: one (type, hour)
    * rollup shuffle; the lag window and the per-type sums share the
    * per-type partitioning, and the series is one row per hour per
    * key no matter how many events fed it; the lag stack explodes the
    * tiny aggregated frame, not the data. */
  def qTsAcf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lags = Seq(1, 2, 3, 6, 12, 24)
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("x"))
    val ord = Window.partitionBy($"event_type").orderBy($"h")
    val all = Window.partitionBy($"event_type")
    val withY = hourly
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("t", sum($"x").over(all))
      .withColumn("y", $"n" * $"x" - $"t")
    val lagged = lags.foldLeft(withY) { (df, l) =>
      df.withColumn(s"y$l", lag($"y", l).over(ord))
    }
    val aggd = lagged.groupBy($"event_type").agg(
      sum($"y" * $"y").as("den"),
      lags.map(l => sum($"y" * col(s"y$l")).as(s"num$l")): _*)
    // den = Σy² = 0 ⇔ the series is constant (every y = 0): Spark's
    // double 0/0 is NaN where DuckDB's is NULL — null the ratio on
    // both engines (the q_ts_anomaly zero-variance convention).
    val stacked = lags.map(l =>
      s"${l}L, round(num$l / CAST(nullif(den, 0) AS DOUBLE), 4)").mkString(", ")
    aggd.selectExpr("event_type",
        s"stack(${lags.size}, $stacked) AS (lag, acf)")
      .orderBy($"event_type", $"lag")
  }

  /** Holt double exponential smoothing (level + trend) over the daily
    * cents series per type, with the 1-step-ahead forecast — the
    * classic baseline forecaster (Holt 1957). α=0.5, β=0.25: dyadic
    * coefficients AND a per-step round(6) on level and trend — the
    * q_graph_pagerank re-synchronization rule — so both engines fold
    * from identical inputs at every step and summation drift cannot
    * compound across the recursion (a recursive smoother is the one
    * shape per-term IEEE equality alone cannot carry end-to-end).
    * Shape: one (type, day) rollup shuffle; the fold runs over each
    * type's COLLECTED daily array — one row per day per key (the
    * q_ts_decay bounded-state argument: series length is bounded by
    * the calendar, not the event volume); init l0 = x0, b0 = x1 − x0
    * (the standard bootstrap). */
  def qTsHolt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val series = daily.groupBy($"event_type")
      .agg(transform(array_sort(collect_list(struct($"d", $"cents"))),
        s => s.getField("cents").cast("double")).as("xs"))
      .filter(size($"xs") >= 2)
    val fold = aggregate(
      slice($"xs", lit(3), greatest(size($"xs") - 2, lit(0))),
      struct(
        $"xs".getItem(1).as("l"),
        ($"xs".getItem(1) - $"xs".getItem(0)).as("b")),
      (acc, x) => {
        val l2 = round(lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b")), 6)
        struct(
          l2.as("l"),
          round(lit(0.25) * (l2 - acc.getField("l"))
            + lit(0.75) * acc.getField("b"), 6).as("b"))
      })
    series
      .withColumn("n", size($"xs"))
      .withColumn("fit", fold)
      .select($"event_type", $"n",
        $"fit".getField("l").as("level"),
        $"fit".getField("b").as("trend"),
        round($"fit".getField("l") + $"fit".getField("b"), 6)
          .as("forecast_1"))
      .orderBy($"event_type")
  }

  /** Hour-of-day SEASONAL profile per event type — the diurnal-cycle
    * decomposition the acf diagnostic (lag-24 peak) motivates: per
    * (type, hour-of-day), activity index (share of events vs flat
    * 1/24) and value index (mean cents vs the type's overall mean).
    * EXACT arithmetic throughout: the activity index is pure integer
    * division ((10000·24·n_h) DIV n_tot — PARITY rule 5), the value
    * index is ONE double division of two exact BIGINT cross-products
    * ((sum_h·n_tot)/(n_h·sum_tot) — the q_llm_gopher cross-multiply
    * rule; both products stay far under 2^63 at any per-key series the
    * calendar can produce). One (type, hod) rollup shuffle; the
    * per-type totals ride a window over the 24-row aggregated frame. */
  def qTsSeasonal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hodAgg = Tables.table(spark, dir, "events")
      .groupBy($"event_type", hour($"ts").cast("long").as("hod"))
      .agg(count(lit(1)).as("n_h"),
        sum(round($"value" * 100).cast("long")).as("sum_h"))
    val w = Window.partitionBy($"event_type")
    hodAgg
      .withColumn("n_tot", sum($"n_h").over(w))
      .withColumn("sum_tot", sum($"sum_h").over(w))
      .select($"event_type", $"hod", $"n_h",
        (expr("(10000 * 24 * n_h) DIV n_tot") / 10000.0)
          .as("activity_idx_4dp"),
        round(($"sum_h" * $"n_tot").cast("double") /
          ($"n_h" * $"sum_tot").cast("double"), 4).as("value_idx"))
      .orderBy($"event_type", $"hod")
  }

  /** Linear-interpolation gap fill — the other standard resample
    * repair (q_resample forward-fills): missing hourly points are
    * reconstructed on the line between their nearest observed
    * neighbours. Gaps are planted deterministically on both engines
    * (hour-index % 7 ∈ {2,3} withheld — runs of up to two consecutive
    * missing hours), so edge rows with no left/right neighbour also
    * occur and stay null.
    *
    * Exactness: cents are BIGINT; the interpolant is
    * prev + (Δv·steps)/gap — one exact integer product and ONE double
    * division (correctly rounded identically on both engines, the
    * q_ts_seasonal value_idx rule). Shape: hourly rollup shuffle, then
    * all four neighbour lookups (prev/next value and hour) are stacked
    * windows over the SAME (type, hour) order — one exchange, the
    * q_ts_anomaly pattern; the grid explode is generated narrow. */
  def qTsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type",
        (unix_timestamp(date_trunc("hour", $"ts")) / 3600L)
          .cast("long").as("h"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val vis = hourly.withColumn("v",
      when(pmod($"h", lit(7L)).isin(2L, 3L), lit(null).cast("long"))
        .otherwise($"cents"))
    val grid = hourly.groupBy($"event_type")
      .agg(min($"h").as("lo"), max($"h").as("hi"))
      .select($"event_type", explode(sequence($"lo", $"hi")).as("h"))
    val joined = grid.join(vis.select($"event_type", $"h", $"v"),
      Seq("event_type", "h"), "left")
    val wPrev = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(1, Window.unboundedFollowing)
    val hKnown = when($"v".isNotNull, $"h")
    joined
      .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(hKnown, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first($"v", ignoreNulls = true).over(wNext))
      .withColumn("nh", first(hKnown, ignoreNulls = true).over(wNext))
      .select($"event_type", $"h",
        when($"v".isNotNull, "observed")
          .when($"pv".isNotNull && $"nv".isNotNull, "interpolated")
          .otherwise("edge").as("status"),
        when($"v".isNotNull, $"v".cast("double"))
          .when($"pv".isNotNull && $"nv".isNotNull,
            $"pv" + (($"nv" - $"pv") * ($"h" - $"ph")).cast("double") /
              ($"nh" - $"ph").cast("double"))
          .as("cents"))
      .orderBy($"event_type", $"h")
  }

  /** Moving-average seasonal decomposition — the classical additive
    * decompose step q_ts_seasonal's ratio-to-mean profile skips: the
    * hourly series is DETRENDED by a centered 25-hour moving average
    * (full windows only), and the per-(type, hour-of-day) mean of the
    * detrended residual is the seasonal component — robust to trends
    * the plain hod-profile conflates with seasonality.
    *
    * ZERO float accumulation: the detrended value is kept SCALED as
    * 25·cents − window_sum (exact BIGINT — no float trend mean ever
    * exists, the q_ts_cusum trick), per-(type,hod) sums stay BIGINT,
    * and the one double division (sum / (25·n)) un-scales at the end
    * (value_idx rule). Shape: hourly rollup shuffle, ONE trailing
    * window on the per-type sort, one (type, hod) rollup of the
    * already-aggregated frame. */
  def qTsDetrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(-12, 12)
    hourly
      .withColumn("wsum", sum($"cents").over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .filter($"wn" === 25)
      .withColumn("det_scaled", lit(25L) * $"cents" - $"wsum")
      .groupBy($"event_type", hour($"h").cast("long").as("hod"))
      .agg(count(lit(1)).as("n_windows"),
        sum($"det_scaled").as("sum_det"))
      .select($"event_type", $"hod", $"n_windows",
        round($"sum_det".cast("double") /
          (lit(25.0) * $"n_windows".cast("double")), 4).as("seasonal_cents"))
      .orderBy($"event_type", $"hod")
  }

  /** Rolling-origin forecast BACKTEST over the daily series: the
    * one-step errors of the two standard baselines every forecaster
    * must beat — naive (x̂_t = x_{t−1}) and drift
    * (x̂_t = x_{t−1} + (x_{t−1} − x_{t−2})) — reported as per-type
    * MAE and RMSE. This is the evaluation rung of the ts family
    * (q_ts_holt fits; nothing yet measured whether fitting beats
    * copying yesterday).
    *
    * Exactness: errors are differences of BIGINT cents (exact);
    * |e| and e² sum as BIGINTs; MAE/RMSE are ONE double division
    * each (+ an IEEE-correctly-rounded sqrt of an exact ratio —
    * bit-identical both engines, the assortativity argument). Shape:
    * one daily rollup shuffle + two lag columns on the per-type sort
    * + a per-type rollup of the aggregated frame. */
  def qTsBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    daily
      .withColumn("p1", lag($"cents", 1).over(w))
      .withColumn("p2", lag($"cents", 2).over(w))
      .filter($"p2".isNotNull) // both baselines defined
      .withColumn("e_naive", $"cents" - $"p1")
      .withColumn("e_drift", $"cents" - ($"p1" + ($"p1" - $"p2")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_evals"),
        sum(abs($"e_naive")).as("sae_n"),
        sum(abs($"e_drift")).as("sae_d"),
        sum($"e_naive" * $"e_naive").as("sse_n"))
      .select($"event_type", $"n_evals",
        round($"sae_n".cast("double") / $"n_evals".cast("double"), 4)
          .as("mae_naive"),
        round($"sae_d".cast("double") / $"n_evals".cast("double"), 4)
          .as("mae_drift"),
        round(sqrt($"sse_n".cast("double") / $"n_evals".cast("double")), 4)
          .as("rmse_naive"))
      .orderBy($"event_type")
  }

  /** Rolling 7-day Pearson correlation between the daily view-cents
    * and purchase-cents series — the co-movement diagnostic (does
    * engagement track conversion this week?). Exact-integer form of
    * the Pearson inside each window (the q_graph_assortativity
    * algebra on the q_ts_cusum cents): with n=7 fixed, num =
    * n·Σxy − Σx·Σy and the two variances are exact BIGINTs from
    * windowed sums of products; r = num / (sqrt(v1)·sqrt(v2)) is one
    * double division of exact operands (sqrt correctly rounded —
    * bit-identical cross-engine), 4 dp; zero-variance windows null on
    * both engines (q_ts_anomaly convention). Shape: ONE (day) rollup
    * shuffle reduces the stream to a calendar-sized two-column frame;
    * the unpartitioned window runs over THAT (the q_llm_mix
    * post-aggregation rule), never the raw events. Partial windows
    * (first 6 days) are excluded so n is constant. */
  def qTsRollcorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = round($"value" * 100).cast("long")
    val daily = Tables.table(spark, dir, "events")
      .groupBy(date_trunc("day", $"ts").as("d"))
      .agg(
        sum(when($"event_type" === "view", cents).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", cents).otherwise(0L)).as("y"))
    val o = Window.orderBy($"d")
    val o7 = o.rowsBetween(-6, Window.currentRow)
    val v1 = lit(7) * $"sxx" - $"sx" * $"sx"
    val v2 = lit(7) * $"syy" - $"sy" * $"sy"
    val num = lit(7) * $"sxy" - $"sx" * $"sy"
    daily
      .withColumn("rn", row_number().over(o))
      .withColumn("sx", sum($"x").over(o7))
      .withColumn("sy", sum($"y").over(o7))
      .withColumn("sxy", sum($"x" * $"y").over(o7))
      .withColumn("sxx", sum($"x" * $"x").over(o7))
      .withColumn("syy", sum($"y" * $"y").over(o7))
      .filter($"rn" >= 7)
      .select($"d", $"x", $"y",
        round(when(v1 === 0 || v2 === 0, lit(null))
          .otherwise(num / (sqrt(v1.cast("double")) * sqrt(v2.cast("double")))),
          4).as("r7"))
      .orderBy($"d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_resample" -> (qResample _),
    "q_ts_rollcorr" -> (qTsRollcorr _),
    "q_ts_interpolate" -> (qTsInterpolate _),
    "q_ts_detrend" -> (qTsDetrend _),
    "q_ts_backtest" -> (qTsBacktest _),
    "q_ts_decay" -> (qTsDecay _),
    "q_ts_anomaly" -> (qTsAnomaly _),
    "q_ts_outlier_mad" -> (qTsOutlierMad _),
    "q_ts_cusum" -> (qTsCusum _),
    "q_ts_acf" -> (qTsAcf _),
    "q_ts_holt" -> (qTsHolt _),
    "q_ts_seasonal" -> (qTsSeasonal _)
  )

  val oracle: Map[String, String] = Map(
    // exact BIGINT windowed sums; one double division of exact
    // operands (sqrt correctly rounded — bit-identical cross-engine)
    "q_ts_rollcorr" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts)::TIMESTAMP AS d,
        |    sum(CASE WHEN event_type = 'view'
        |        THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN round(value * 100)::BIGINT ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY d),
        |w AS (
        |  SELECT d, x, y,
        |    row_number() OVER o AS rn,
        |    sum(x) OVER o7 AS sx, sum(y) OVER o7 AS sy,
        |    sum(x*y) OVER o7 AS sxy,
        |    sum(x*x) OVER o7 AS sxx, sum(y*y) OVER o7 AS syy
        |  FROM daily
        |  WINDOW o AS (ORDER BY d),
        |    o7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT d, x, y,
        |  round(CASE WHEN 7*sxx - sx*sx = 0 OR 7*syy - sy*sy = 0 THEN NULL
        |    ELSE (7*sxy - sx*sy) /
        |      (sqrt((7*sxx - sx*sx)::DOUBLE) * sqrt((7*syy - sy*sy)::DOUBLE))
        |    END, 4) AS r7
        |FROM w WHERE rn >= 7
        |ORDER BY d""".stripMargin,
    // exact BIGINT error sums; one division each + a correctly-rounded
    // sqrt of an exact ratio (bit-identical cross-engine)
    "q_ts_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, cents,
        |    lag(cents, 1) OVER tw AS p1,
        |    lag(cents, 2) OVER tw AS p2
        |  FROM daily
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY d)),
        |e AS (
        |  SELECT event_type,
        |    cents - p1 AS e_naive,
        |    cents - (p1 + (p1 - p2)) AS e_drift
        |  FROM lagged WHERE p2 IS NOT NULL)
        |SELECT event_type, count(*) AS n_evals,
        |  round(sum(abs(e_naive))::BIGINT::DOUBLE / count(*)::DOUBLE, 4)
        |    AS mae_naive,
        |  round(sum(abs(e_drift))::BIGINT::DOUBLE / count(*)::DOUBLE, 4)
        |    AS mae_drift,
        |  round(sqrt(sum(e_naive * e_naive)::BIGINT::DOUBLE
        |    / count(*)::DOUBLE), 4) AS rmse_naive
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // det_scaled = 25·cents − wsum keeps detrending in exact BIGINTs;
    // full (25-point) windows only; sums cast ::BIGINT (HUGEINT rule)
    "q_ts_detrend" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, h, cents,
        |    sum(cents) OVER tw::BIGINT AS wsum,
        |    count(*) OVER tw AS wn
        |  FROM hourly
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (
        |  SELECT event_type, hour(h)::BIGINT AS hod,
        |    25 * cents - wsum AS det_scaled
        |  FROM w WHERE wn = 25)
        |SELECT event_type, hod, count(*) AS n_windows,
        |  round(sum(det_scaled)::DOUBLE / (25.0 * count(*)::DOUBLE), 4)
        |    AS seasonal_cents
        |FROM d GROUP BY event_type, hod
        |ORDER BY event_type, hod""".stripMargin,
    // same planted h%7∈{2,3} gaps; interpolant = exact BIGINT product
    // + ONE double division (the value_idx rule); IGNORE NULLS windows
    "q_ts_interpolate" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch(date_trunc('hour', ts))::BIGINT // 3600 AS h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |vis AS (
        |  SELECT event_type, h,
        |    CASE WHEN h % 7 IN (2, 3) THEN NULL ELSE cents END AS v
        |  FROM hourly),
        |grid AS (
        |  SELECT event_type, unnest(range(lo, hi + 1)) AS h
        |  FROM (SELECT event_type, min(h) AS lo, max(h) AS hi
        |        FROM hourly GROUP BY event_type)),
        |j AS (
        |  SELECT g.event_type, g.h, vis.v
        |  FROM grid g LEFT JOIN vis USING (event_type, h)),
        |w AS (
        |  SELECT event_type, h, v,
        |    last_value(v IGNORE NULLS) OVER pw AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER pw AS ph,
        |    first_value(v IGNORE NULLS) OVER nw AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER nw AS nh
        |  FROM j
        |  WINDOW pw AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         nw AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, h,
        |  CASE WHEN v IS NOT NULL THEN 'observed'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
        |       ELSE 'edge' END AS status,
        |  CASE WHEN v IS NOT NULL THEN v::DOUBLE
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |         THEN pv + ((nv - pv) * (h - ph))::DOUBLE / (nh - ph)::DOUBLE
        |       END AS cents
        |FROM w ORDER BY event_type, h""".stripMargin,
    // integer-div activity index; value index = one double division of
    // exact BIGINT cross-products (sum casts ::BIGINT — HUGEINT rule)
    "q_ts_seasonal" ->
      """WITH h AS (
        |  SELECT event_type, hour(ts)::BIGINT AS hod,
        |    count(*)::BIGINT AS n_h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS sum_h
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *, sum(n_h) OVER (PARTITION BY event_type)::BIGINT AS n_tot,
        |    sum(sum_h) OVER (PARTITION BY event_type)::BIGINT AS sum_tot
        |  FROM h)
        |SELECT event_type, hod, n_h,
        |  ((10000 * 24 * n_h) // n_tot) / 10000.0 AS activity_idx_4dp,
        |  round((sum_h * n_tot)::DOUBLE / (n_h * sum_tot)::DOUBLE, 4)
        |    AS value_idx
        |FROM t ORDER BY event_type, hod""".stripMargin,
    // flag from the ROUNDED z on both sides; warmup + zero-variance
    // windows excluded on both sides
    // both medians land on exact k/k+0.5 over the integer-cents
    // series, so deviations and the 4.5·mad boundary are float-exact
    "q_ts_outlier_mad" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, quantile_cont(cents, 0.5) AS m
        |  FROM hourly GROUP BY 1),
        |d AS (
        |  SELECT h.event_type, h.h, h.cents, abs(h.cents - m.m) AS dev
        |  FROM hourly h JOIN med m USING (event_type)),
        |mads AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, d.h, d.cents,
        |  round(d.dev / m.mad, 4) AS rz,
        |  d.dev > 4.5 * m.mad AS outlier
        |FROM d JOIN mads m USING (event_type)
        |WHERE m.mad > 0
        |ORDER BY event_type, h""".stripMargin,
    "q_ts_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, h, cents,
        |    count(*) OVER tw AS nw, avg(cents) OVER tw AS mu,
        |    stddev_samp(cents) OVER tw AS sd
        |  FROM hourly
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, h, cents,
        |  round((cents - mu) / sd, 4) AS z,
        |  abs(round((cents - mu) / sd, 4)) > 3 AS anomaly
        |FROM w WHERE nw >= 12 AND sd > 0
        |ORDER BY event_type, h""".stripMargin,
    // S_i = N*cum_i - i*T keeps the mean-centered cumsum in exact
    // BIGINTs — no float mean on either engine
    "q_ts_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS d,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, d, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
        |    sum(cents) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(cents) OVER (PARTITION BY event_type) AS t
        |  FROM daily),
        |s AS (
        |  SELECT event_type, d, cents, (n * cum - i * t)::BIGINT AS s
        |  FROM idx)
        |SELECT event_type, d, cents, s,
        |  abs(s) = max(abs(s)) OVER (PARTITION BY event_type) AS peak
        |FROM s ORDER BY event_type, d""".stripMargin,
    // decay 0.5 → dyadic weights → exact doubles on both engines
    "q_ts_decay" ->
      """WITH base AS (
        |  SELECT user_id, event_id, round(value * 100)::BIGINT AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY event_id
        |                      ROWS 7 PRECEDING) AS trail
        |  FROM base)
        |SELECT user_id, event_id,
        |  round(list_sum(list_transform(range(len(trail)),
        |    i -> trail[i + 1] * power(0.5, len(trail) - 1 - i))), 4)
        |    AS decayed
        |FROM w ORDER BY user_id, event_id""".stripMargin,
    "q_resample" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value, date_trunc('hour', ts) AS slot
        |  FROM events WHERE user_id < 20),
        |bounds AS (SELECT min(slot) AS lo, max(slot) AS hi FROM ev),
        |grid AS (
        |  SELECT u.user_id, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS slot
        |  FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN bounds b),
        |hourly AS (
        |  SELECT user_id, slot, count(*) AS n_events,
        |    max_by(value, event_id) AS last_value
        |  FROM ev GROUP BY user_id, slot)
        |SELECT g.user_id, g.slot,
        |  coalesce(h.n_events, 0) AS n_events,
        |  last_value(h.last_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.slot = h.slot
        |ORDER BY g.user_id, g.slot""".stripMargin,
    // recursive-CTE evaluation of the same recursion (the q_graph_reach
    // "different strategy" precedent — deliberately NOT list_reduce:
    // DuckDB 1.0.0 evaluates struct_pack fields SEQUENTIALLY against a
    // mutating accumulator inside list_reduce lambdas, so a two-field
    // state update reads its sibling's NEW value — probed, and the
    // kind of silent engine quirk the oracle must not depend on);
    // per-step round(6) re-synchronizes both engines at every
    // recursion step (the pagerank rule)
    "q_ts_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
        |  FROM daily),
        |sz AS (SELECT event_type, max(i)::BIGINT AS n FROM idx
        |       GROUP BY event_type HAVING max(i) >= 2),
        |rec AS (
        |  SELECT x2.event_type, 2::BIGINT AS i,
        |    x2.cents::DOUBLE AS l, (x2.cents - x1.cents)::DOUBLE AS b
        |  FROM idx x1 JOIN idx x2 USING (event_type)
        |  WHERE x1.i = 1 AND x2.i = 2
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |    round(0.5 * x.cents + 0.5 * (r.l + r.b), 6),
        |    round(0.25 * (round(0.5 * x.cents + 0.5 * (r.l + r.b), 6)
        |      - r.l) + 0.75 * r.b, 6)
        |  FROM rec r JOIN idx x
        |    ON x.event_type = r.event_type AND x.i = r.i + 1)
        |SELECT r.event_type, sz.n, r.l AS level, r.b AS trend,
        |  round(r.l + r.b, 6) AS forecast_1
        |FROM rec r JOIN sz USING (event_type)
        |WHERE r.i = sz.n
        |ORDER BY r.event_type""".stripMargin,
    // y_t = n*x_t - T keeps the mean-centered series in exact BIGINTs
    // (the q_ts_cusum scaling); acf = one double division, 4 dp
    "q_ts_acf" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, h,
        |    (count(*) OVER (PARTITION BY event_type) * x
        |      - sum(x) OVER (PARTITION BY event_type))::BIGINT AS y
        |  FROM hourly),
        |lagged AS (
        |  SELECT event_type, y,
        |    lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2,
        |    lag(y, 3) OVER w AS y3, lag(y, 6) OVER w AS y6,
        |    lag(y, 12) OVER w AS y12, lag(y, 24) OVER w AS y24
        |  FROM y WINDOW w AS (PARTITION BY event_type ORDER BY h)),
        |aggd AS (
        |  SELECT event_type, sum(y * y)::BIGINT AS den,
        |    sum(y * y1)::BIGINT AS num1, sum(y * y2)::BIGINT AS num2,
        |    sum(y * y3)::BIGINT AS num3, sum(y * y6)::BIGINT AS num6,
        |    sum(y * y12)::BIGINT AS num12, sum(y * y24)::BIGINT AS num24
        |  FROM lagged GROUP BY event_type)
        |SELECT event_type, lag, acf FROM (
        |  SELECT event_type, 1::BIGINT AS lag,
        |    round(num1 / CAST(nullif(den, 0) AS DOUBLE), 4) AS acf FROM aggd
        |  UNION ALL SELECT event_type, 2, round(num2 / CAST(nullif(den, 0) AS DOUBLE), 4) FROM aggd
        |  UNION ALL SELECT event_type, 3, round(num3 / CAST(nullif(den, 0) AS DOUBLE), 4) FROM aggd
        |  UNION ALL SELECT event_type, 6, round(num6 / CAST(nullif(den, 0) AS DOUBLE), 4) FROM aggd
        |  UNION ALL SELECT event_type, 12, round(num12 / CAST(nullif(den, 0) AS DOUBLE), 4) FROM aggd
        |  UNION ALL SELECT event_type, 24, round(num24 / CAST(nullif(den, 0) AS DOUBLE), 4) FROM aggd)
        |ORDER BY event_type, lag""".stripMargin
  )
}
