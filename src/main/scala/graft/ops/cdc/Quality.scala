package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality / inspection operators beyond diff+checksum: the
  * dbt-style constraint checks a CDC tool runs against its replica
  * (not-null, unique-key, referential integrity, range), plus the
  * classic sessionization and binning analyses over event streams.
  *
  * Scale notes: each check is an aggregate or anti-join — one shuffle
  * each, results are tiny (one row per rule), so a 100 TB replica
  * audit is a handful of scans that can share the cache.
  */
object Quality {

  /** Constraint audit: one row per rule with its violation count. */
  def qDqConstraints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.table(spark, dir, "lineitem")
    val orders = Tables.table(spark, dir, "orders")
    val customer = Tables.table(spark, dir, "customer")

    val notNull = customer.agg(
      count(when($"c_name".isNull, 1)).as("violations"))
      .select(lit("customer.c_name NOT NULL").as("rule"), $"violations")

    val uniquePk = orders.groupBy($"o_orderkey").count()
      .filter($"count" > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders.o_orderkey UNIQUE").as("rule"), $"violations")

    val refInt = li.join(orders, $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem.l_orderkey REFERENCES orders").as("rule"), $"violations")

    val range = li.agg(
      count(when($"l_discount" < 0.0 || $"l_discount" > 1.0, 1)).as("violations"))
      .select(lit("lineitem.l_discount IN [0,1]").as("rule"), $"violations")

    notNull.unionByName(uniquePk).unionByName(refInt).unionByName(range)
      .orderBy($"rule")
  }

  /** Sessionization (batch gaps-and-islands): a new session starts
    * after a >30 min silence; emits per-session bounds and counts. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val wsess = Window.partitionBy($"user_id", $"session_id")
    Tables.table(spark, dir, "events")
      .withColumn("ts_s", date_trunc("second", $"ts"))
      .withColumn("prev_ts", lag($"ts_s", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts_s") - unix_timestamp($"prev_ts") > 1800, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum($"new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(
        min($"ts_s").as("session_start"),
        max($"ts_s").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"session_id")
  }

  /** Sequential conversion funnel view → click → purchase, each hop
    * converting within 24 h of the previous stage's timestamp — the
    * standard product-analytics companion of sessionization (ordered
    * stages with per-hop windows; an unordered "did all three ever"
    * count is just q_agg_conditional). Emits per-user stage
    * timestamps and reached depth.
    *
    * Scale shape: each stage is a filtered per-user min (map-side
    * partial agg) joined to the PREVIOUS stage's user-sized output —
    * the stage frames shrink monotonically (stage k ≤ stage k−1 users
    * ≤ distinct users ≪ events), so every hop join is broadcast-able
    * no matter the event volume, and nothing windows over the raw
    * event stream. Timestamps pass through untouched (same parquet
    * microseconds on both engines — exact). */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
      .select($"user_id", $"event_type", $"ts")
    // each stage materializes ONCE (per-user 1-row aggregates — the
    // holdable frames): without the checkpoints, s1's view-scan
    // subtree re-executes inside s2, s3 AND the final join (6 event
    // scans in one plan, r14 multi-scan audit); with them each
    // event_type slice is scanned exactly once, pushed-filtered
    val s1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
      .localCheckpoint()
    val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts" > $"t1" && $"ts" <= $"t1" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("t2"))
      .localCheckpoint()
    val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts" > $"t2" && $"ts" <= $"t2" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select($"user_id", $"t1", $"t2", $"t3",
        (lit(1) + when($"t2".isNotNull, 1).otherwise(0)
          + when($"t3".isNotNull, 1).otherwise(0)).cast("long").as("depth"))
      .orderBy($"user_id")
  }

  /** Weekly cohort retention — the third member of the product-
    * analytics trio (sessionize = within-visit, funnel = ordered
    * conversion, retention = do users COME BACK): users grouped by
    * first-active week, count of distinct users active in each
    * subsequent week. The matrix every growth dashboard draws.
    *
    * Scale shape: the raw stream reduces to DISTINCT (user, week)
    * first (one shuffle, weeks-per-user-sized output ≪ events), the
    * cohort is a per-user min over THAT frame, and the cohort join is
    * user-keyed (co-partitioned with the distinct's output — AQE
    * reuses the exchange). week_n is exact integer arithmetic on
    * epoch seconds (both engines truncate weeks to Monday; the
    * difference is an exact multiple of 604800 — no datediff('week')
    * boundary-counting ambiguity). */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val uw = Tables.table(spark, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
      .distinct()
      // the user-week reduction materializes ONCE (≪ events): cohort
      // derivation and the cohort join both read it, otherwise each
      // re-scans events (r14 multi-scan audit)
      .localCheckpoint()
    val cohort = uw.groupBy($"user_id").agg(min($"wk").as("cohort"))
    uw.join(cohort, "user_id")
      .withColumn("week_n",
        ((unix_timestamp($"wk") - unix_timestamp($"cohort")) / 604800)
          .cast("long"))
      .groupBy($"cohort", $"week_n")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort", $"week_n")
  }

  /** Last-touch attribution — for each purchase, the most recent click
    * by the same user within a 3-day lookback, null if none (the
    * marketing-analytics sibling of the funnel). Implemented ON the
    * [[graft.plans.AsofJoin.asofBackward]] operator (one shuffle,
    * union+window — never a per-user range self-join) with the
    * lookback applied as a post-filter that nulls out-of-window
    * matches: as-of-with-tolerance is exactly this composition.
    * The oracle runs the naive left-range-join + row_number form —
    * the hash match certifies the as-of machinery against it. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val inWindow = $"asof_c_ts" >= $"p_ts" - expr("INTERVAL 3 DAYS")
    graft.plans.AsofJoin.asofBackward(
        p, c, keys = Seq("user_id"), leftTime = "p_ts", rightTime = "c_ts",
        rightCols = Seq("click_id"), tieBreak = "click_id")
      .select($"purchase_id", $"user_id", $"p_ts",
        when(inWindow, $"asof_click_id").as("click_id"),
        when(inWindow, $"asof_c_ts").as("c_ts"))
      .orderBy($"purchase_id")
  }

  /** DAU / WAU / MAU active-user series with the DAU/MAU stickiness
    * ratio — the top-line engagement dashboard. Windowed COUNT
    * DISTINCT is not expressible as a frame aggregate (distinct
    * doesn't decompose over sliding frames), so the trailing windows
    * compute as a day-grid range join over the DISTINCT (user, day)
    * reduction: exact by construction on both engines, and the join
    * fans out by at most the window length (×30) over a frame that is
    * already ≪ events — the honest exact shape at 100 TB until the
    * DISTINCT (user, day) frame itself outgrows the cluster; past
    * that, trade in [[activeUsersApprox]] (same series off per-day
    * HLL blobs).
    * Stickiness = exact integer-div 4dp (PARITY rule 5). */
  def qActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.table(spark, dir, "events")
      .select($"user_id", date_trunc("day", $"ts").as("d"))
      .distinct()
    // ONE generate + ONE aggregate (optimization r19, guide §2.4/§3
    // "avoid accidental cartesians": the previous form range-JOINED
    // the user-day frame against the day grid twice — two broadcast
    // nested-loop joins, each evaluating |grid| predicates per
    // user-day — then joined three aggregates back together, with a
    // checkpoint job to keep the five-scan plan at one event read).
    // Each (user, d) row contributes to exactly the 30 trailing grid
    // days d..d+29, so EXPLODE that window and fold all three series
    // in one grouped aggregate: dau = distinct users at lag 0, wau =
    // within 6 days, mau = all fanned rows. Emitted g beyond the last
    // observed day (and any g with no same-day event) have dau = 0 —
    // exactly the rows the previous inner join with the DAU series
    // dropped. Same exact distinct counts, same grid, no joins, no
    // checkpoint; the fan-out (×30 of the REDUCED user-day frame) is
    // the same row set the old joins emitted into their aggregates.
    ud.select($"user_id", $"d", explode(sequence($"d",
        $"d" + expr("INTERVAL 29 DAYS"), expr("INTERVAL 1 DAY"))).as("g"))
      .groupBy($"g")
      .agg(
        countDistinct(when($"d" === $"g", $"user_id")).as("dau"),
        countDistinct(when($"d" >= $"g" - expr("INTERVAL 6 DAYS"),
          $"user_id")).as("wau"),
        countDistinct($"user_id").as("mau"))
      .filter($"dau" > 0)
      .select($"g".as("d"), $"dau", $"wau", $"mau",
        (expr("(10000 * dau) DIV mau") / 10000.0).as("stickiness"))
      .orderBy($"d")
  }

  /** Approximate DAU / WAU / MAU — the sketch rung of [[qActiveUsers]]
    * (VERDICT r13 #4), for the regime where even the DISTINCT
    * (user, day) reduction is too big to range-join: reduce each day
    * to ONE mergeable HLL blob (`hll_sketch_agg` — partial sketches
    * combine map-side, so the shuffle carries ≤ partitions×days
    * sketches, never user rows), then build every trailing window by
    * UNIONING ≤30 blobs (`hll_union_agg`) over the same day-grid join
    * the exact form uses — but on a days×(2^lgK bytes) frame that
    * broadcasts at ANY event scale. State is O(days·4KB): 100 TB of
    * events compresses to a few MB of blobs, and a new day appends one
    * blob without touching history (HLL unions associatively; day
    * partitions are append-stable, so the no-subtract limitation never
    * bites — the same algebra [[NdvMaintain]] maintains per-group).
    *
    * Accuracy contract: ~2% standard error at lgK=12 once a window's
    * cardinality passes the sketch's exact (coupon) regime; BELOW that
    * threshold datasketches HLL is exact, which is what QualitySpec
    * certifies — at sf0.001 the series equals [[qActiveUsers]] row for
    * row (the NdvMaintainSpec trick). No DuckDB oracle: past the
    * coupon regime the estimate is engine-specific by design. */
  def activeUsersApprox(spark: SparkSession, dir: String,
                        lgK: Int = 12): DataFrame = {
    import spark.implicits._
    dauSeries(Tables.table(spark, dir, "events")
      .select($"user_id", date_trunc("day", $"ts").as("d"))
      .groupBy($"d")
      .agg(hll_sketch_agg($"user_id", lit(lgK)).as("sketch")))
  }

  /** DAU/WAU/MAU series off an ALREADY-BUILT per-day blob table
    * (`d` timestamp day, `sketch` HLL blob) — shared by the in-query
    * rung above and the incrementally maintained blob table
    * ([[graft.streaming.DauStream]]): the read path is identical
    * whether the blobs were just aggregated or streamed in over
    * months. */
  def dauSeries(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    // days × 4KB — materialize once; grid, DAU and both trailing
    // unions read the blobs, never the source again
    val dayBlobs = blobs.localCheckpoint()
    val grid = dayBlobs.select($"d".as("g"))
    def trailing(daysBack: Int, name: String) =
      dayBlobs.join(grid,
          $"d" <= $"g" && $"d" >= $"g" - expr(s"INTERVAL $daysBack DAYS"))
        .groupBy($"g")
        .agg(hll_sketch_estimate(hll_union_agg($"sketch", lit(false)))
          .as(name))
    dayBlobs
      .select($"d".as("g"), hll_sketch_estimate($"sketch").as("dau"))
      .join(trailing(6, "wau"), "g").join(trailing(29, "mau"), "g")
      .select($"g".as("d"), $"dau", $"wau", $"mau",
        (expr("(10000 * dau) DIV mau") / 10000.0).as("stickiness"))
      .orderBy($"d")
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands engagement metric (the "N-day streak" badge).
    * Island key = epoch-day index minus the per-user row number over
    * distinct active days: consecutive days share it, any gap breaks
    * it — pure exact-integer arithmetic, zero drift.
    *
    * Scale shape: the stream reduces to DISTINCT (user, day) FIRST
    * (the qRetention rule); the island window partitions per user
    * (maximal parallelism); streak lengths and the per-user max are
    * two more aggregations of the already-user-day-sized frame. */
  def qStreak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.table(spark, dir, "events")
      .select($"user_id", date_trunc("day", $"ts").as("d"))
      .distinct()
      .withColumn("di", (unix_timestamp($"d") / 86400).cast("long"))
    val w = Window.partitionBy($"user_id").orderBy($"di")
    days
      .withColumn("grp", $"di" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").as("active_days"), max($"len").as("longest_streak"))
      .orderBy($"user_id")
  }

  /** Cohort lifetime value: cumulative purchase cents per first-
    * active-week cohort, by weeks-since — the revenue companion of
    * [[qRetention]] (retention counts who comes back; LTV counts what
    * they spend). Per-user-average LTV is the growth metric the
    * cohort chart plots.
    *
    * Scale shape: one (cohort, week) rollup shuffle after the
    * user-keyed cohort join (the qRetention shape carrying cents);
    * the cumulative window and the per-user division run over the
    * calendar-sized aggregate (q_llm_mix rule). Cents are exact
    * BIGINTs; ltv_per_user is ONE double division of two exact
    * BIGINTs, 4 dp (value_idx rule). */
  def qLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").as("wk"),
        when($"event_type" === "purchase",
          round($"value" * 100).cast("long")).otherwise(0L).as("cents"))
    // per-user cohort materializes ONCE (holdable): the weekly join
    // and cohortSize both read it; events itself is scanned twice by
    // design (one pass builds cohorts, one attributes revenue)
    val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort"))
      .localCheckpoint()
    val weekly = ev.join(cohort, "user_id")
      .withColumn("week_n",
        ((unix_timestamp($"wk") - unix_timestamp($"cohort")) / 604800)
          .cast("long"))
      .groupBy($"cohort", $"week_n")
      .agg(sum($"cents").as("week_cents"),
        countDistinct($"user_id").as("active_users"))
    val cohortSize = cohort.groupBy($"cohort")
      .agg(count(lit(1)).as("cohort_users"))
    val cum = Window.partitionBy($"cohort").orderBy($"week_n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.join(cohortSize, "cohort")
      .withColumn("cum_cents", sum($"week_cents").over(cum))
      .select($"cohort", $"week_n", $"cohort_users", $"active_users",
        $"week_cents", $"cum_cents",
        round($"cum_cents" / $"cohort_users", 4).as("ltv_per_user"))
      .orderBy($"cohort", $"week_n")
  }

  /** Event pathing: the per-user transition matrix (event_type →
    * next event_type) with counts and per-source shares — the Markov
    * first-order view funnels/retention summarize away ("after a
    * view, what happens next?"). Completes the product-analytics
    * quartet.
    *
    * Scale shape: ONE per-user window pass (the q_sessionize sort)
    * builds the transition pairs narrowly; the count shuffle carries
    * (from, to) vocabulary pairs, never events; the share is an
    * exact-integer division over the POST-AGGREGATION frame (≤
    * |types|² rows — the q_llm_mix rule). Share = integer-div 4dp
    * (PARITY rule 5: cnt·10000 DIV total / 10000.0 — exact on both
    * engines, no double sum ever exists). */
  def qPathing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.table(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type".as("from_type"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .filter($"to_type".isNotNull)
    val counts = pairs.groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("cnt"))
    val wsrc = Window.partitionBy($"from_type")
    counts
      .withColumn("src_total", sum($"cnt").over(wsrc))
      .select($"from_type", $"to_type", $"cnt",
        (expr("(10000 * cnt) DIV src_total") / 10000.0).as("share"))
      .orderBy($"from_type", $"to_type")
  }

  /** Histogram: fixed-width value binning over order totals. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val width = 50000.0
    Tables.table(spark, dir, "orders")
      .withColumn("bin", floor($"o_totalprice" / width).cast("long"))
      .groupBy($"bin")
      .agg(
        count(lit(1)).as("n"),
        round(min($"o_totalprice"), 2).as("lo"),
        round(max($"o_totalprice"), 2).as("hi"))
      .orderBy($"bin")
  }

  /** Distribution-drift monitor (`q_dq_drift`): Population Stability
    * Index of order totals, 1996 baseline vs 2000 current — the DQ
    * rung constraint checks can't reach (every row individually valid,
    * the DISTRIBUTION silently shifted; the check a replica audit or
    * a feature-store freshness gate runs per column per day).
    *
    * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over fixed-width buckets
    * (floor(total/50k) capped at 9 — fixed edges, NOT quantiles of
    * one side: quantile edges differ across engines and drift with
    * the baseline, the classic PSI-monitoring mistake). Add-one
    * smoothing keeps empty buckets finite and deterministic. Shape:
    * two bucket-count aggregates over one scan each + a 10-row grid
    * join — at 100 TB the scans dominate and both partial-combine;
    * the PSI arithmetic runs on the bucket-domain frame. Cross-engine:
    * counts exact; p, q, and each ln() run on IDENTICAL doubles
    * (exact-int divisions), psi_term rounds 6dp. */
  def qDqDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.table(spark, dir, "orders")
      .select(year($"o_orderdate").as("y"),
        least(floor($"o_totalprice" / 50000.0), lit(9.0)).cast("long")
          .as("bucket"))
    def side(yr: Int, n: String) = ord.filter($"y" === yr)
      .groupBy($"bucket").agg(count(lit(1)).as(n))
    // ONE partition for the 10-row bucket grid (optimization r20)
    val grid = spark.range(0, 10, 1, 1).select($"id".as("bucket"))
    val joined = grid
      .join(side(1996, "n_base"), Seq("bucket"), "left")
      .join(side(2000, "n_curr"), Seq("bucket"), "left")
      .select($"bucket",
        coalesce($"n_base", lit(0L)).as("n_base"),
        coalesce($"n_curr", lit(0L)).as("n_curr"))
    val tot = joined.agg(sum($"n_base").as("tb"), sum($"n_curr").as("tc"))
    joined.crossJoin(broadcast(tot))
      .select($"bucket", $"n_base", $"n_curr",
        (($"n_base" + 1.0) / ($"tb" + 10.0)).as("p"),
        (($"n_curr" + 1.0) / ($"tc" + 10.0)).as("q"))
      .select($"bucket", $"n_base", $"n_curr",
        // JVM Math.log and libm log may differ 1 ulp on identical
        // inputs (ADVICE r12); a value landing exactly on the 6dp
        // boundary could then flake. If that ever happens, round the
        // p/q ratio before the log (both engines would then feed log
        // the same shorter-mantissa double) — kept as-is until
        // observed, matching the repo's measured-not-guessed rule.
        round(($"p" - $"q") * log($"p" / $"q"), 6).as("psi_term"))
      .orderBy($"bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_drift" -> (qDqDrift _),
    "q_dq_constraints" -> (qDqConstraints _),
    "q_sessionize" -> (qSessionize _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_attribution" -> (qAttribution _),
    "q_pathing" -> (qPathing _),
    "q_ltv" -> (qLtv _),
    "q_streak" -> (qStreak _),
    "q_active_users" -> (qActiveUsers _),
    "q_histogram" -> (qHistogram _)
  )

  val oracle: Map[String, String] = Map(
    // same fixed bucket edges + add-one smoothing; exact-int count
    // divisions make p/q/ln identical doubles on both engines
    "q_dq_drift" ->
      """WITH b AS (
        |  SELECT year(o_orderdate) AS y,
        |    least(floor(o_totalprice / 50000.0), 9.0)::BIGINT AS bucket
        |  FROM orders),
        |base AS (
        |  SELECT bucket, count(*)::BIGINT AS n_base FROM b
        |  WHERE y = 1996 GROUP BY bucket),
        |curr AS (
        |  SELECT bucket, count(*)::BIGINT AS n_curr FROM b
        |  WHERE y = 2000 GROUP BY bucket),
        |grid AS (
        |  SELECT g.range::BIGINT AS bucket,
        |    coalesce(n_base, 0)::BIGINT AS n_base,
        |    coalesce(n_curr, 0)::BIGINT AS n_curr
        |  FROM range(0, 10) g
        |  LEFT JOIN base ON g.range = base.bucket
        |  LEFT JOIN curr ON g.range = curr.bucket),
        |tot AS (
        |  SELECT sum(n_base)::BIGINT AS tb, sum(n_curr)::BIGINT AS tc
        |  FROM grid)
        |SELECT bucket, n_base, n_curr,
        |  round(((n_base + 1.0) / (tb + 10.0) - (n_curr + 1.0) / (tc + 10.0))
        |    * ln(((n_base + 1.0) / (tb + 10.0))
        |      / ((n_curr + 1.0) / (tc + 10.0))), 6) AS psi_term
        |FROM grid, tot ORDER BY bucket""".stripMargin,
    "q_dq_constraints" ->
      """SELECT * FROM (
        |  SELECT 'customer.c_name NOT NULL' AS rule,
        |    count(*) FILTER (WHERE c_name IS NULL) AS violations FROM customer
        |  UNION ALL
        |  SELECT 'orders.o_orderkey UNIQUE',
        |    count(*) FROM (SELECT o_orderkey FROM orders
        |                   GROUP BY o_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey REFERENCES orders',
        |    count(*) FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_discount IN [0,1]',
        |    count(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 1.0)
        |  FROM lineitem)
        |ORDER BY rule""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS ts_s FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_s,
        |    CASE WHEN lag(ts_s) OVER w IS NULL
        |           OR epoch(ts_s)::BIGINT - epoch(lag(ts_s) OVER w)::BIGINT > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ts_s,
        |    (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  min(ts_s) AS session_start, max(ts_s) AS session_end,
        |  count(*) AS n_events
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // timestamps pass through untouched — exact on both engines
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 24 HOURS GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 24 HOURS GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |  (1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,
    // weeks truncate to Monday on both engines; week_n is an exact
    // integer multiple of 604800 epoch seconds — no datediff('week')
    "q_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
        |SELECT cohort,
        |  ((epoch(wk)::BIGINT - epoch(cohort)::BIGINT) / 604800)::BIGINT AS week_n,
        |  count(DISTINCT user_id) AS active_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY cohort, week_n
        |ORDER BY cohort, week_n""".stripMargin,
    // the naive left-range-join + row_number form — the hash match
    // certifies asofBackward + lookback post-filter against it
    "q_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
        |  WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id, c.c_ts,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY c.c_ts DESC, c.click_id DESC) AS rk
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts)
        |SELECT purchase_id, user_id, p_ts,
        |  CASE WHEN c_ts >= p_ts - INTERVAL 3 DAYS THEN click_id END AS click_id,
        |  CASE WHEN c_ts >= p_ts - INTERVAL 3 DAYS THEN c_ts END AS c_ts
        |FROM j WHERE rk = 1
        |ORDER BY purchase_id""".stripMargin,
    // exact windowed distinct via the day-grid range join; stickiness
    // integer-div 4dp
    "q_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts)::TIMESTAMP AS d
        |  FROM events),
        |grid AS (SELECT DISTINCT d AS g FROM ud),
        |dau AS (
        |  SELECT d AS g, count(DISTINCT user_id) AS dau
        |  FROM ud GROUP BY d),
        |wau AS (
        |  SELECT g, count(DISTINCT user_id) AS wau
        |  FROM ud JOIN grid ON d <= g AND d >= g - INTERVAL 6 DAYS
        |  GROUP BY g),
        |mau AS (
        |  SELECT g, count(DISTINCT user_id) AS mau
        |  FROM ud JOIN grid ON d <= g AND d >= g - INTERVAL 29 DAYS
        |  GROUP BY g)
        |SELECT dau.g AS d, dau.dau, wau.wau, mau.mau,
        |  ((10000 * dau.dau) // mau.mau) / 10000.0 AS stickiness
        |FROM dau JOIN wau USING (g) JOIN mau USING (g)
        |ORDER BY d""".stripMargin,
    // island key = epoch-day index − per-user row number: exact ints
    "q_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts)::TIMESTAMP AS d
        |  FROM events),
        |idx AS (
        |  SELECT user_id,
        |    (epoch(d)::BIGINT / 86400)::BIGINT
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, grp, count(*) AS len
        |  FROM idx GROUP BY user_id, grp)
        |SELECT user_id, sum(len)::BIGINT AS active_days,
        |  max(len)::BIGINT AS longest_streak
        |FROM streaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // cents exact BIGINT; one double division of exact operands 4dp
    "q_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('week', ts)::TIMESTAMP AS wk,
        |    CASE WHEN event_type = 'purchase'
        |      THEN round(value * 100)::BIGINT ELSE 0 END AS cents
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
        |weekly AS (
        |  SELECT cohort,
        |    ((epoch(wk)::BIGINT - epoch(cohort)::BIGINT) / 604800)::BIGINT
        |      AS week_n,
        |    sum(cents)::BIGINT AS week_cents,
        |    count(DISTINCT ev.user_id) AS active_users
        |  FROM ev JOIN c USING (user_id)
        |  GROUP BY cohort, week_n),
        |sz AS (SELECT cohort, count(*) AS cohort_users FROM c GROUP BY cohort)
        |SELECT w.cohort, w.week_n, sz.cohort_users, w.active_users,
        |  w.week_cents,
        |  (sum(w.week_cents) OVER (PARTITION BY w.cohort ORDER BY w.week_n
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |    AS cum_cents,
        |  round(cum_cents / cohort_users, 4) AS ltv_per_user
        |FROM weekly w JOIN sz USING (cohort)
        |ORDER BY w.cohort, w.week_n""".stripMargin,
    // transition pairs off ONE per-user ordered window; share is the
    // exact integer-div 4dp (PARITY rule 5) — no double sums exist
    "q_pathing" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |counts AS (
        |  SELECT from_type, to_type, count(*) AS cnt
        |  FROM pairs WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type)
        |SELECT from_type, to_type, cnt,
        |  ((10000 * cnt) // sum(cnt) OVER (PARTITION BY from_type))
        |    / 10000.0 AS share
        |FROM counts
        |ORDER BY from_type, to_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders
        |GROUP BY bin
        |ORDER BY bin""".stripMargin
  )
}
