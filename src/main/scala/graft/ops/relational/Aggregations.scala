package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-D aggregation operators (SURVEY.md). Each key pairs a DataFrame
  * implementation with the DuckDB oracle SQL that must hash-match it.
  *
  * Scale notes: `groupBy().agg()` compiles to a two-phase hash
  * aggregate (partial map-side combine → shuffle on the group keys →
  * final), so the shuffle carries only one row per (partition × group),
  * not the raw table — the right shape for a 100 TB lineitem.
  */
object Aggregations {

  /** TPC-H Q1-shaped flagship: multi-measure hash agg over lineitem.
    * Determinism: round(…,2) on double aggregates, total-order sort. */
  def qAggBasic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")
          * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_extendedprice"), 2).as("avg_price"),
        round(avg($"l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Exact COUNT(DISTINCT), incl. multi-distinct in one agg — Spark
    * plans this via Expand + two-phase agg (shuffle carries the
    * distinct pairs, not raw rows). */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_parts"),
        countDistinct($"l_suppkey").as("nd_supps"),
        countDistinct($"l_partkey", $"l_suppkey").as("nd_pairs"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Approximate distinct via HLL. The raw estimates are engine-specific
    * and can't hash-match DuckDB, so the emitted output is made
    * deterministic: exact count(distinct) plus within-±5%-of-exact
    * booleans for each estimator (the oracle asserts `true`). Both the
    * one-shot estimator and the datasketches lifecycle (agg → estimate)
    * still execute — only their presentation is normalized. */
  def qAggApproxHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", rsd = 0.02).as("approx_parts"),
        hll_sketch_estimate(hll_sketch_agg($"l_partkey")).as("hll_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select(
        $"l_returnflag",
        $"exact_parts",
        (abs($"approx_parts" - $"exact_parts") <= $"exact_parts" * 0.05)
          .as("approx_within_5pct"),
        (abs($"hll_parts" - $"exact_parts") <= $"exact_parts" * 0.05)
          .as("sketch_within_5pct"))
      .orderBy($"l_returnflag")
  }

  /** GROUPING SETS with per-column grouping() markers (engine-neutral,
    * unlike the grouping_id bitmask whose bit order is unspecified). */
  def qAggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping($"l_returnflag").as("g_rf"),
        grouping($"l_linestatus").as("g_ls"))
      .orderBy($"g_rf", $"g_ls",
        $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** ROLLUP over the region → nation hierarchy. */
  def qAggRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer")
      .join(Tables.table(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(Tables.table(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum($"c_acctbal"), 2).as("sum_bal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** CUBE over returnflag × linestatus. */
  def qAggCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Filtered / conditional aggregation. */
  def qAggConditional(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(sum(when($"l_discount" > 0.05, $"l_quantity").otherwise(0.0)), 2)
          .as("qty_highdisc"),
        count_if($"l_tax" > 0.04).as("n_hightax"),
        round(avg(when($"l_linestatus" === "F", $"l_extendedprice")), 2)
          .as("avg_price_f"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** Deterministic list aggregation: collect, array_sort, then join to
    * one string (the driver's pandas comparator can't hash list cells). */
  def qAggCollect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "supplier")
      .join(Tables.table(spark, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        array_join(array_sort(collect_list($"s_name")), "|").as("suppliers"),
        count(lit(1)).as("n"))
      .orderBy($"n_name")
  }

  /** Exact statistical aggregates. stddev/var/corr/covar merge partial
    * moments across partitions — order-dependent in low-order bits, so
    * rounded to 4dp (SURVEY §5.4). */
  /** Higher central moments (`q_agg_moments`): per-group skewness and
    * excess kurtosis computed from EXACT integer power sums (Σx..Σx⁴
    * over the small-domain quantity column) — the one-pass, order-free,
    * map-side-combinable moment algebra (power sums are plain sums, so
    * partials merge associatively; the float enters only in the final
    * per-group scalar step, where both engines evaluate the identical
    * expression over identical exact inputs). Built-in skewness/
    * kurtosis are NOT cross-engine comparable (population vs
    * sample-corrected conventions differ); the power-sum form pins the
    * convention explicitly (population moments, excess kurtosis). */
  def qAggMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = $"l_quantity".cast("long")
    val agg = Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("s1"),
        sum(q * q).as("s2"), sum(q * q * q).as("s3"),
        sum(q * q * q * q).as("s4"))
    val (n, s1, s2, s3, s4) = ($"n".cast("double"), $"s1".cast("double"),
      $"s2".cast("double"), $"s3".cast("double"), $"s4".cast("double"))
    val m1 = s1 / n
    val m2 = s2 / n - m1 * m1
    val m3 = s3 / n - lit(3.0) * m1 * (s2 / n) + lit(2.0) * m1 * m1 * m1
    val m4 = s4 / n - lit(4.0) * m1 * (s3 / n) +
      lit(6.0) * m1 * m1 * (s2 / n) - lit(3.0) * m1 * m1 * m1 * m1
    agg.select($"l_returnflag", $"n",
        round(m1, 4).as("mean_qty"),
        round(m3 / pow(m2, 1.5), 4).as("skew_qty"),
        round(m4 / (m2 * m2) - 3.0, 4).as("kurt_qty"))
      .orderBy($"l_returnflag")
  }

  def qAggStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
        round(var_samp($"l_quantity"), 4).as("var_qty"),
        round(corr($"l_extendedprice", $"l_quantity"), 4).as("corr_pq"),
        round(covar_samp($"l_extendedprice", $"l_quantity"), 4).as("covar_pq"),
        round(percentile($"l_extendedprice", lit(0.5)), 4).as("median_price"),
        round(percentile($"l_extendedprice", lit(0.9)), 4).as("p90_price"))
      .orderBy($"l_returnflag")
  }

  /** Approximate quantiles (percentile_approx's KLL-style rank sketch)
    * presented like qAggApproxHll: exact percentiles plus
    * within-tolerance booleans, since the sketch estimates themselves
    * are engine-specific. At 100 TB the sketch is the only option —
    * exact percentile sorts the group; the sketch merges partials. */
  def qAggApproxQuantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("ap50"),
        percentile_approx($"l_extendedprice", lit(0.9), lit(10000)).as("ap90"),
        percentile($"l_extendedprice", lit(0.5)).as("ep50"),
        percentile($"l_extendedprice", lit(0.9)).as("ep90"),
        count(lit(1)).as("n"))
      .select(
        $"l_returnflag", $"n",
        round($"ep50", 2).as("exact_p50"),
        round($"ep90", 2).as("exact_p90"),
        (abs($"ap50" - $"ep50") <= $"ep50" * 0.02).as("p50_within_2pct"),
        (abs($"ap90" - $"ep90") <= $"ep90" * 0.02).as("p90_within_2pct"))
      .orderBy($"l_returnflag")
  }

  /** Custom typed UDAF: discount-weighted average price per group. */
  def qUdafWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(graft.functions.WeightedAvg.weighted_avg(
          $"l_extendedprice", $"l_discount"), 2).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** Deterministic MODE (most frequent value) per group — the missing
    * member of the exact-aggregate family (median/percentile live in
    * q_agg_stats). Engine-native `mode()` leaves ties unspecified, so
    * both sides compute it explicitly: value-level counts first, then
    * an argmax with the (count desc, value asc) tie-break encoded as
    * `max(struct(cnt, -value))` — an ordinary two-phase aggregate, no
    * window, no rank serialization.
    *
    * Scale shape: groupBy (flag, qty) partial-combines map-side, so
    * the shuffle carries one row per distinct (group, value) — the
    * value domain, not the table; the second aggregate runs over that
    * already-tiny frame. Share is the integer-div 4dp form (PARITY
    * rule 5). */
  def qAggMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.table(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy($"l_returnflag")
      .agg(
        max(struct($"cnt", (-$"l_quantity").as("nq"))).as("b"),
        sum($"cnt").as("n_rows"),
        count(lit(1)).as("n_values"))
      .select($"l_returnflag",
        (-$"b.nq").as("mode_qty"),
        $"b.cnt".as("mode_cnt"),
        $"n_rows", $"n_values",
        (expr("(10000 * b.cnt) DIV n_rows") / 10000.0).as("mode_share_4dp"))
      .orderBy($"l_returnflag")
  }

  /** Ordered string aggregation (LISTAGG / STRING_AGG — the report
    * column every SQL user writes): per customer segment, the
    * DISTINCT order-priority labels joined in order. WITHIN GROUP
    * ordering + DISTINCT make the string fully deterministic (the
    * q_agg_collect array_sort rule, in string form).
    *
    * Engine quirk, probed: Spark 4.1.2's distinct-aggregate rewrite
    * crashes (AttributeReference→SortOrder cast) when
    * `listagg(DISTINCT …) WITHIN GROUP` shares the aggregate with a
    * SECOND distinct aggregate, so n_priorities derives from the
    * joined string instead of a countDistinct. */
  def qAggListagg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        expr("listagg(DISTINCT o_orderpriority, '|') " +
          "WITHIN GROUP (ORDER BY o_orderpriority)").as("priorities"),
        count(lit(1)).as("n_orders"))
      .select($"c_mktsegment", $"priorities",
        size(split($"priorities", "\\|")).cast("long").as("n_priorities"),
        $"n_orders")
      .orderBy($"c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_basic" -> (qAggBasic _),
    "q_agg_mode" -> (qAggMode _),
    "q_agg_listagg" -> (qAggListagg _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_approx_hll" -> (qAggApproxHll _),
    "q_agg_grouping_sets" -> (qAggGroupingSets _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_conditional" -> (qAggConditional _),
    "q_agg_collect" -> (qAggCollect _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_moments" -> (qAggMoments _),
    "q_agg_approx_quantile" -> (qAggApproxQuantile _),
    "q_udaf_weighted_avg" -> (qUdafWeightedAvg _)
  )

  val oracle: Map[String, String] = Map(
    // DISTINCT + explicit ORDER BY make the joined string deterministic
    "q_agg_listagg" ->
      """SELECT c_mktsegment,
        |  string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
        |    AS priorities,
        |  len(string_split(string_agg(DISTINCT o_orderpriority,
        |    '|' ORDER BY o_orderpriority), '|'))::BIGINT AS n_priorities,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // same explicit argmax + tie-break as the Spark side (engine-native
    // mode() has unspecified ties); sum(cnt) cast ::BIGINT (HUGEINT rule)
    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_returnflag,
        |    max({'cnt': cnt, 'nq': -l_quantity}) AS b,
        |    sum(cnt)::BIGINT AS n_rows,
        |    count(*) AS n_values
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag,
        |  -(b.nq) AS mode_qty,
        |  b.cnt AS mode_cnt,
        |  n_rows, n_values,
        |  ((10000 * b.cnt) // n_rows) / 10000.0 AS mode_share_4dp
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 2) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_parts,
        |  count(DISTINCT l_suppkey) AS nd_supps,
        |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_pairs,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the HLL estimates themselves are engine-specific; the emitted
    // shape (exact + within-tolerance booleans) is deterministic
    "q_agg_approx_hll" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  true AS approx_within_5pct,
        |  true AS sketch_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // same presentation rule as q_agg_approx_hll: sketch estimates are
    // engine-specific, so the oracle pins the exact values + booleans
    "q_agg_approx_quantile" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS exact_p90,
        |  true AS p50_within_2pct,
        |  true AS p90_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_conditional" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0.0 END), 2) AS qty_highdisc,
        |  count(*) FILTER (WHERE l_tax > 0.04) AS n_hightax,
        |  round(avg(l_extendedprice) FILTER (WHERE l_linestatus = 'F'), 2) AS avg_price_f,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_collect" ->
      """SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        |  count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // identical power sums (exact integers both engines — sum casts
    // back from HUGEINT), identical final float expression shape
    "q_agg_moments" ->
      """WITH a AS (
        |  SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(l_quantity::BIGINT)::BIGINT AS s1,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT)::BIGINT AS s2,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT *
        |        l_quantity::BIGINT)::BIGINT AS s3,
        |    sum(l_quantity::BIGINT * l_quantity::BIGINT *
        |        l_quantity::BIGINT * l_quantity::BIGINT)::BIGINT AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, n,
        |    s1::DOUBLE / n::DOUBLE AS m1,
        |    s2::DOUBLE / n::DOUBLE AS r2,
        |    s3::DOUBLE / n::DOUBLE AS r3,
        |    s4::DOUBLE / n::DOUBLE AS r4
        |  FROM a),
        |c AS (
        |  SELECT l_returnflag, n, m1,
        |    r2 - m1 * m1 AS m2,
        |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
        |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
        |      - 3.0 * m1 * m1 * m1 * m1 AS m4
        |  FROM m)
        |SELECT l_returnflag, n, round(m1, 4) AS mean_qty,
        |  round(m3 / pow(m2, 1.5), 4) AS skew_qty,
        |  round(m4 / (m2 * m2) - 3.0, 4) AS kurt_qty
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_discount) / sum(l_discount), 2) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
