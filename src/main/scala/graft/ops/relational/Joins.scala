package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.AsofJoin

/** §2-C join operators.
  *
  * Scale notes per strategy:
  * - broadcast hash: dim side ships to every executor once — the only
  *   shuffle-free equi-join; always the pick for star-schema dims.
  * - sort-merge: both sides shuffle+sort on the key — the robust
  *   default for fact×fact; spills instead of OOMing, AQE splits skew.
  * - shuffle hash: shuffle both sides, hash the smaller — beats SMJ
  *   when one side is much smaller than the other but too big to
  *   broadcast.
  * - theta joins compile to BroadcastNestedLoopJoin: only sane when
  *   one side is tiny (here: a 3-row band table).
  * - as-of: see plans.AsofJoin (union+window, single shuffle).
  */
object Joins {

  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .join(broadcast(Tables.table(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"p_brand", $"p_name")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def qJoinSortmerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .hint("merge")
      .join(Tables.table(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables.table(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(Tables.table(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  def qJoinShufflehash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .hint("shuffle_hash")
      .join(Tables.table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(
        round(sum($"l_quantity"), 2).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy($"s_suppkey")
  }

  /** Non-equi (theta) join against a 3-row inline band table. */
  def qJoinTheta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("small", 0.0, 50000.0),
      ("medium", 50000.0, 200000.0),
      ("large", 200000.0, 1e9)).toDF("band", "lo", "hi")
    Tables.table(spark, dir, "orders")
      .join(bands, $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .select($"o_orderkey", $"band")
      .orderBy($"o_orderkey")
  }

  /** Full outer: customers (custkey >= 50) vs per-user event counts —
    * left-only, right-only, and matched rows all present. */
  def qJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    Tables.table(spark, dir, "customer")
      .filter($"c_custkey" >= 50)
      .join(ev, $"c_custkey" === $"user_id", "full_outer")
      .select($"c_custkey", $"user_id", $"n_events")
      .orderBy(coalesce($"c_custkey", $"user_id").asc, $"c_custkey".asc_nulls_last)
  }

  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer")
      .join(Tables.table(spark, dir, "events"),
        $"c_custkey" === $"user_id", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer")
      .join(Tables.table(spark, dir, "events"),
        $"c_custkey" === $"user_id", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Range (interval) join: per user, every event within 30 minutes
    * AFTER each signup. Times second-truncated on both engines (the
    * raw column is ns-precision — SURVEY §5.4). */
  def qJoinRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
      .withColumn("ts_s", date_trunc("second", $"ts"))
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id", $"ts_s".as("signup_ts"))
    val others = ev.select($"event_id", $"user_id".as("e_user"), $"event_type", $"ts_s")
    signups.join(others,
        $"e_user" === $"user_id" &&
        $"ts_s" > $"signup_ts" &&
        $"ts_s" <= $"signup_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"signup_id", $"event_id", $"event_type")
      .orderBy($"signup_id", $"event_id")
  }

  /** As-of join: for each purchase, the latest 'view' event at-or-
    * before it by the same user (union+window impl — plans.AsofJoin). */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    AsofJoin.asofBackward(
        purchases, views,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightCols = Seq("event_id", "value"), tieBreak = "event_id")
      .select($"purchase_id", $"asof_event_id".as("view_id"), $"asof_value".as("view_value"))
      .orderBy($"purchase_id")
  }

  def qJoinCross(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "region")
      .crossJoin(Tables.table(spark, dir, "nation"))
      .select($"r_regionkey", $"n_nationkey", $"r_name", $"n_name")
      .orderBy($"r_regionkey", $"n_nationkey")
  }

  /** Interval OVERLAP join (ranges × ranges — the genomics/temporal
    * workload class; q_join_range is point-in-range): error-event
    * incident windows (1–7 h, keyed off the event id) joined to
    * purchase windows (1 h) on overlap, aggregated per incident.
    *
    * The scale-right plan: BINNED equi-join, not a theta join. Each
    * interval explodes onto the hour cells it covers (≤ 8 rows per
    * incident, 2 per purchase — generated narrow, the sequence()
    * explode pattern), the join runs as an ordinary HASH join on the
    * cell key, and each true overlap is counted EXACTLY ONCE without
    * any distinct: a pair is kept only in the cell where
    * greatest(start, start) falls — every overlapping pair has
    * exactly one such cell inside both coverages, so dedup is free by
    * construction. A theta join (the oracle's evaluation) is a
    * nested-loop over the full cross product — correct, and exactly
    * what does NOT survive 100 TB; the hash match certifies the
    * binned decomposition against it. Time base is integer epoch
    * MILLISECONDS on both engines (unix_millis / epoch_ms — both
    * floor the µs-precision source, probed equal), so the overlap
    * predicate and cell arithmetic are exact integer compares. */
  def qJoinInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourMs = 3600000L
    val ev = Tables.table(spark, dir, "events")
      .select($"event_id", $"event_type",
        // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the
        // ntz→ltz cast is instant-preserving and unix_millis matches
        // DuckDB's epoch_ms on the naive value
        unix_millis($"ts".cast("timestamp")).as("s"),
        round($"value" * 100).cast("long").as("cents"))
    val inc = ev.filter($"event_type" === "error")
      .select($"event_id".as("inc_id"), $"s".as("i_lo"),
        ($"s" + (pmod($"event_id", lit(7)) + 1) * hourMs).as("i_hi"))
    val pur = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"s".as("p_lo"),
        ($"s" + hourMs).as("p_hi"), $"cents")
    val ic = inc.withColumn("cell",
      explode(sequence(expr("i_lo DIV 3600000"), expr("i_hi DIV 3600000"))))
    val pc = pur.withColumn("cell",
      explode(sequence(expr("p_lo DIV 3600000"), expr("p_hi DIV 3600000"))))
    ic.join(pc,
        ic("cell") === pc("cell") &&
          $"i_lo" <= $"p_hi" && $"p_lo" <= $"i_hi" &&
          expr("greatest(i_lo, p_lo) DIV 3600000") === ic("cell"))
      .groupBy($"inc_id")
      .agg(count(lit(1)).as("n_overlaps"), sum($"cents").as("sum_cents"))
      .orderBy($"inc_id")
  }

  /** Spatial RADIUS join (points × points within Euclidean distance r
    * — the geo workload class: "customers near a warehouse"). The
    * corpus carries no geo columns, so deterministic synthetic
    * coordinates on a 1000×1000 integer grid are derived in-query on
    * BOTH engines from the entity keys (multiplicative hash mod grid —
    * exact integer arithmetic, no floats anywhere: the distance
    * predicate compares squared integers).
    *
    * The scale-right plan is the q_join_interval argument in 2-D:
    * GRID-BINNED equi-join, not a distance theta join. Cells have side
    * = r, so any pair within r lies in the same or an adjacent cell —
    * the small (supplier) side explodes onto its 3×3 cell
    * neighbourhood (9 rows each, generated narrow), the join is an
    * ordinary HASH join on the encoded cell id, and the exact integer
    * distance filter runs on the bounded candidates. No pair can match
    * in two cells (the customer side maps to exactly ONE cell), so
    * exactly-once needs no dedup at all — simpler than the interval
    * join's greatest-start rule. The oracle evaluates the full
    * distance theta join — the evaluation that does NOT survive 100 TB
    * — so the hash match certifies the binned decomposition. */
  def qJoinSpatial(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = 25L
    val cust = Tables.table(spark, dir, "customer")
      .select($"c_custkey", ($"c_custkey" * 37 % 1000).as("cx"),
        ($"c_custkey" * 91 % 1000).as("cy"))
      .withColumn("cell",
        expr(s"(cx DIV $r) * 64 + (cy DIV $r)"))
    val supp = Tables.table(spark, dir, "supplier")
      .select($"s_suppkey", ($"s_suppkey" * 53 % 1000).as("sx"),
        ($"s_suppkey" * 17 % 1000).as("sy"))
      .withColumn("cell", explode(expr(
        s"flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), " +
          s"dy -> ((sx DIV $r) + dx) * 64 + ((sy DIV $r) + dy))))")))
    cust.join(supp, "cell")
      .filter(($"cx" - $"sx") * ($"cx" - $"sx") +
        ($"cy" - $"sy") * ($"cy" - $"sy") <= r * r)
      .select($"c_custkey", $"s_suppkey",
        (($"cx" - $"sx") * ($"cx" - $"sx") +
          ($"cy" - $"sy") * ($"cy" - $"sy")).as("dist2"))
      .orderBy($"c_custkey", $"s_suppkey")
  }

  /** Explicit salted skew join, certified against the plain join: a
    * pathological hot key is PLANTED (every third lineitem collapses
    * onto key 0 — at sf0.1 that's ~200k rows on one key, the "one key
    * ≫ a partition" class AQE's split cannot always save, e.g. inside
    * streaming foreachBatch where AQE is off), the join runs through
    * [[graft.plans.SaltedJoin.saltedEquiJoin]] (hot key spread over 8
    * reducers, dim replicated 8×), and the oracle evaluates the PLAIN
    * join — the hash match proves salting is pure routing, invisible
    * in the result. The salt never leaves the join (dropped before the
    * aggregate), so the group-by re-merges the spread rows. */
  def qJoinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.table(spark, dir, "lineitem")
      .select(
        when($"l_orderkey" % 3 === 0, 0L)
          .otherwise(pmod($"l_suppkey", lit(100L))).as("k"),
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val dim = Tables.table(spark, dir, "supplier")
      .groupBy(pmod($"s_suppkey", lit(100L)).as("k"))
      .agg(min($"s_name").as("dim_name"))
    graft.plans.SaltedJoin.saltedEquiJoin(fact, dim, "k", 8)
      .groupBy($"k", $"dim_name")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
      .orderBy($"k")
  }

  /** Forward as-of: for each purchase, the NEXT view at-or-after it
    * per user (the lookahead attribution twin of q_join_asof); same
    * single-shuffle union+window plan, mirrored frame. */
  def qJoinAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    AsofJoin.asofForward(
        purchases, views,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightCols = Seq("event_id", "value"), tieBreak = "event_id")
      .select($"purchase_id", $"asof_event_id".as("view_id"),
        $"asof_value".as("view_value"))
      .orderBy($"purchase_id")
  }

  /** NEAREST as-of (`q_join_asof_nearest`): each purchase attributed
    * to the temporally CLOSEST view by the same user, either direction
    * — the third as-of flavor (backward = q_join_asof, forward =
    * q_join_asof_fwd). Distance ties resolve backward; same-instant
    * rows count as backward (distance 0). Distances compare in exact
    * integer microseconds on BOTH engines (unix_micros / epoch_us) —
    * never a float timestamp cast. */
  def qJoinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts", $"value")
    AsofJoin.asofNearest(
        purchases, views,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightCols = Seq("event_id", "value"), tieBreak = "event_id")
      .select($"purchase_id", $"asof_event_id".as("view_id"),
        $"asof_value".as("view_value"))
      .orderBy($"purchase_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_asof_nearest" -> (qJoinAsofNearest _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_asof_fwd" -> (qJoinAsofFwd _),
    "q_join_skew_salted" -> (qJoinSkewSalted _),
    "q_join_sortmerge" -> (qJoinSortmerge _),
    "q_join_shufflehash" -> (qJoinShufflehash _),
    "q_join_theta" -> (qJoinTheta _),
    "q_join_outer" -> (qJoinOuter _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_range" -> (qJoinRange _),
    "q_join_asof" -> (qJoinAsof _),
    "q_join_cross" -> (qJoinCross _),
    "q_join_interval" -> (qJoinInterval _),
    "q_join_spatial" -> (qJoinSpatial _)
  )

  val oracle: Map[String, String] = Map(
    // the PLAIN join — certifies the salted routing is result-invisible
    "q_join_skew_salted" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 0
        |              ELSE l_suppkey % 100 END AS k,
        |    round(l_extendedprice * 100)::BIGINT AS cents
        |  FROM lineitem),
        |dim AS (
        |  SELECT s_suppkey % 100 AS k, min(s_name) AS dim_name
        |  FROM supplier GROUP BY 1)
        |SELECT k, dim_name, count(*) AS n_rows,
        |  sum(cents)::BIGINT AS sum_cents
        |FROM fact JOIN dim USING (k)
        |GROUP BY k, dim_name ORDER BY k""".stripMargin,
    // the distance THETA evaluation — certifies the grid-binned
    // equi-join decomposition (same exact integer arithmetic)
    "q_join_spatial" ->
      """SELECT c_custkey, s_suppkey,
        |  (c_custkey * 37 % 1000 - s_suppkey * 53 % 1000)
        |    * (c_custkey * 37 % 1000 - s_suppkey * 53 % 1000)
        |  + (c_custkey * 91 % 1000 - s_suppkey * 17 % 1000)
        |    * (c_custkey * 91 % 1000 - s_suppkey * 17 % 1000) AS dist2
        |FROM customer, supplier
        |WHERE (c_custkey * 37 % 1000 - s_suppkey * 53 % 1000)
        |    * (c_custkey * 37 % 1000 - s_suppkey * 53 % 1000)
        |  + (c_custkey * 91 % 1000 - s_suppkey * 17 % 1000)
        |    * (c_custkey * 91 % 1000 - s_suppkey * 17 % 1000) <= 625
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
    // the oracle evaluates the THETA form — a genuinely different
    // strategy, so the hash match certifies the binned equi-join
    // counts every overlapping pair exactly once
    "q_join_interval" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS s,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |inc AS (
        |  SELECT event_id AS inc_id, s AS i_lo,
        |    s + (event_id % 7 + 1) * 3600000 AS i_hi
        |  FROM ev WHERE event_type = 'error'),
        |pur AS (
        |  SELECT event_id AS p_id, s AS p_lo, s + 3600000 AS p_hi, cents
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT inc_id, count(*)::BIGINT AS n_overlaps,
        |  sum(cents)::BIGINT AS sum_cents
        |FROM inc JOIN pur ON i_lo <= p_hi AND p_lo <= i_hi
        |GROUP BY inc_id ORDER BY inc_id""".stripMargin,
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_name
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT r_name, n_name,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_shufflehash" ->
      """SELECT s_suppkey, s_name,
        |  round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY s_suppkey""".stripMargin,
    "q_join_theta" ->
      """SELECT o_orderkey, b.band
        |FROM orders
        |JOIN (VALUES ('small', 0.0, 50000.0),
        |             ('medium', 50000.0, 200000.0),
        |             ('large', 200000.0, 1e9)) AS b(band, lo, hi)
        |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, user_id, n_events
        |FROM (SELECT * FROM customer WHERE c_custkey >= 50) c
        |FULL OUTER JOIN (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
        |  ON c.c_custkey = e.user_id
        |ORDER BY coalesce(c_custkey, user_id) ASC, c_custkey ASC NULLS LAST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_range" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |                   date_trunc('second', ts) AS ts_s FROM events)
        |SELECT s.event_id AS signup_id, e.event_id, e.event_type
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') s
        |JOIN ev e ON e.user_id = s.user_id
        |         AND e.ts_s > s.ts_s
        |         AND e.ts_s <= s.ts_s + INTERVAL 30 MINUTE
        |ORDER BY signup_id, e.event_id""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |       v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,
    // the theta + argmin evaluation (explicit min-tieBreak — native
    // ASOF leaves equal-timestamp ties unspecified) certifies the
    // mirrored union+window plan
    // nearest = min |Δt| in exact integer micros; distance ties go
    // BACKWARD ((v.ts > p.ts) ASC), and within a side the tieBreak
    // mirrors the directional joins (backward max id, forward min id)
    "q_join_asof_nearest" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.purchase_id, v.event_id AS view_id,
        |    v.value AS view_value,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
        |               (v.ts > p.ts) ASC,
        |               CASE WHEN v.ts <= p.ts THEN -v.event_id
        |                    ELSE v.event_id END ASC) AS rk
        |  FROM p JOIN v ON p.user_id = v.user_id)
        |SELECT p.purchase_id, m.view_id, m.view_value
        |FROM p LEFT JOIN (SELECT * FROM m WHERE rk = 1) m
        |  USING (purchase_id)
        |ORDER BY purchase_id""".stripMargin,
    "q_join_asof_fwd" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.purchase_id, v.event_id AS view_id,
        |    v.value AS view_value,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |                       ORDER BY v.ts ASC, v.event_id ASC) AS rk
        |  FROM p JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts)
        |SELECT p.purchase_id, m.view_id, m.view_value
        |FROM p LEFT JOIN (SELECT * FROM m WHERE rk = 1) m
        |  USING (purchase_id)
        |ORDER BY purchase_id""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin
  )
}
