package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-E window functions.
  *
  * Scale notes: a window over partitionBy(K).orderBy(T) is ONE shuffle
  * on K + per-partition sort — same cost class as a groupBy. The
  * hazard at 100 TB is a partition key with huge groups (all rows for
  * one key materialize in one task); every window here keys on a
  * bounded-cardinality-per-key column. Window ORDER BY always includes
  * a unique tiebreak column so results are total-ordered (SURVEY §5.4).
  */
object Windows {

  /** row_number / rank / dense_rank / ntile / percent_rank. */
  def qWindowRanking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.table(spark, dir, "customer")
      .select(
        $"c_custkey", $"c_mktsegment", $"c_acctbal",
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy($"c_custkey")
  }

  /** cume_dist — the distribution-function window completing the
    * ranking family (q_window_ranking has row_number/rank/dense_rank/
    * ntile/percent_rank): per segment, each customer's balance
    * percentile as P(X <= x), plus the IQR-membership flag an outlier
    * report derives from it. cume_dist = n_le / n_part is ONE double
    * division of two exact window counts — bit-identical cross-engine
    * (the value_idx rule); the flag compares the ROUNDED value so a
    * boundary cannot flip it. */
  def qWindowCume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // order by the VALUE alone (no unique tiebreak): ties must share
    // their cume_dist — with a tiebreak it degenerates to rn/n; rows
    // with equal (segment, balance) emit identical values, so the
    // output is still total-order deterministic
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".asc)
    Tables.table(spark, dir, "customer")
      .select(
        $"c_custkey", $"c_mktsegment", $"c_acctbal",
        round(cume_dist().over(w), 6).as("cd"))
      .withColumn("in_iqr", $"cd" >= 0.25 && $"cd" <= 0.75)
      .orderBy($"c_custkey")
  }

  /** lag / lead: previous and next event per user. */
  def qWindowLaglead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
    Tables.table(spark, dir, "events")
      .select(
        $"event_id", $"user_id", $"event_type",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"event_type", 1).over(w).as("next_type"),
        lag($"event_id", 2).over(w).as("prev2_id"))
      .orderBy($"event_id")
  }

  /** Running sum / avg / count with a ROWS frame. */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(spark, dir, "orders")
      // running_avg = sum/n hits .xx5 round boundaries for small n, and
      // DuckDB promotes ALL division to DOUBLE (no exact decimal path) —
      // so do half-up rounding in integer cents, exact on both engines:
      // avg_cents = (2*sum_cents + n) div (2*n)
      .withColumn("__sumc",
        round(sum($"o_totalprice").over(w) * 100)
          .cast(org.apache.spark.sql.types.LongType))
      .withColumn("__rn", count(lit(1)).over(w))
      .select(
        $"o_orderkey", $"o_custkey",
        round(sum($"o_totalprice").over(w), 2).as("running_total"),
        (expr("(__sumc * 2 + __rn) DIV (__rn * 2)") / 100.0).as("running_avg"),
        $"__rn".as("running_n"))
      .orderBy($"o_orderkey")
  }

  /** RANGE frame over a numeric day offset: per customer, total order
    * value within ±30 days of each order. */
  def qWindowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day_off".asc)
      .rangeBetween(-30, 30)
    Tables.table(spark, dir, "orders")
      .withColumn("day_off",
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long"))
      .select(
        $"o_orderkey", $"o_custkey", $"day_off",
        round(sum($"o_totalprice").over(w), 2).as("sum_60d"),
        count(lit(1)).over(w).as("n_60d"))
      .orderBy($"o_orderkey")
  }

  /** Top-k per group: 3 highest-value orders per customer. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** first_value / last_value / nth_value over a full-partition frame. */
  def qWindowFirstlast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.table(spark, dir, "orders")
      .select(
        $"o_orderkey", $"o_custkey",
        first($"o_totalprice").over(w).as("first_price"),
        last($"o_totalprice").over(w).as("last_price"),
        nth_value($"o_totalprice", 2).over(w).as("second_price"))
      .orderBy($"o_orderkey")
  }

  /** Sliding exact median (`q_window_median`): the trailing-24h
    * median of the integer-cents hourly series — the robust rolling
    * baseline dashboards pair with the rolling mean (q_window_running)
    * and the z-score anomaly flag. Exactness: over integers every
    * window median lands on k or k+0.5 (binary-representable), so the
    * values are float-exact cross-engine — percentile-as-window is the
    * one aggregate family where "approx is cheaper" does not hold at
    * this frame size (24 rows re-sorted per row is the honest cost;
    * at wider frames the KLL sketch path takes over). */
  def qWindowMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(-23, 0)
    hourly
      .withColumn("med24", percentile($"cents", lit(0.5)).over(w))
      .select($"event_type", $"h", $"cents", round($"med24", 4).as("med24"))
      .orderBy($"event_type", $"h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_median" -> (qWindowMedian _),
    "q_window_firstlast" -> (qWindowFirstlast _),
    "q_window_ranking" -> (qWindowRanking _),
    "q_window_cume" -> (qWindowCume _),
    "q_window_laglead" -> (qWindowLaglead _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_range_frame" -> (qWindowRangeFrame _),
    "q_topk_per_group" -> (qTopkPerGroup _)
  )

  val oracle: Map[String, String] = Map(
    // integer-cents windows: every median is k or k+0.5 exactly
    "q_window_median" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    sum(round(value * 100)::BIGINT)::BIGINT AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, h, cents,
        |  round(quantile_cont(cents, 0.5) OVER (
        |    PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 4) AS med24
        |FROM hourly ORDER BY event_type, h""".stripMargin,
    // ties share their cume_dist (no unique tiebreak in the window
    // order — see the Spark side); flag from the ROUNDED value
    "q_window_cume" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  round(cume_dist() OVER (PARTITION BY c_mktsegment
        |                          ORDER BY c_acctbal ASC), 6) AS cd,
        |  (round(cume_dist() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal ASC), 6) >= 0.25
        |   AND round(cume_dist() OVER (PARTITION BY c_mktsegment
        |                               ORDER BY c_acctbal ASC), 6) <= 0.75)
        |    AS in_iqr
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_ranking" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_laglead" ->
      """SELECT event_id, user_id, event_type,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type,
        |  lag(event_id, 2) OVER w AS prev2_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_window_running" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey,
        |    round(sum(o_totalprice) OVER w, 2) AS running_total,
        |    round(sum(o_totalprice) OVER w * 100)::BIGINT AS sumc,
        |    count(*) OVER w AS running_n
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT o_orderkey, o_custkey, running_total,
        |  ((sumc * 2 + running_n) // (running_n * 2)) / 100.0 AS running_avg,
        |  running_n
        |FROM t
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      """WITH t AS (
        |  SELECT *, date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS day_off
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day_off,
        |  round(sum(o_totalprice) OVER w, 2) AS sum_60d,
        |  count(*) OVER w AS n_60d
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_off ASC
        |             RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
  )
}
