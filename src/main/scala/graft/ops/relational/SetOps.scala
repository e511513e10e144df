package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-G set operations & dedup.
  *
  * Scale notes: UNION ALL is a zero-shuffle concatenation of the
  * children's partitions. INTERSECT/EXCEPT/DISTINCT compile to hash
  * aggregates on the full row — one shuffle on the row key, with
  * map-side partial dedup first, so the shuffle carries distinct rows
  * per partition, not raw cardinality.
  */
object SetOps {

  /** UNION ALL of position-compatible projections (entity id + tag). */
  def qSetUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.table(spark, dir, "customer")
      .select($"c_custkey".as("id"), lit("customer").as("src"))
    val s = Tables.table(spark, dir, "supplier")
      .select($"s_suppkey".as("id"), lit("supplier").as("src"))
    c.unionAll(s).orderBy($"src", $"id")
  }

  /** INTERSECT (distinct): customers that both ordered and have events. */
  def qSetIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders").select($"o_custkey".as("k"))
      .intersect(Tables.table(spark, dir, "events").select($"user_id".as("k")))
      .orderBy($"k")
  }

  /** EXCEPT (distinct): customers that never emitted an event. */
  def qSetExcept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer").select($"c_custkey".as("k"))
      .except(Tables.table(spark, dir, "events").select($"user_id".as("k")))
      .orderBy($"k")
  }

  /** DISTINCT over a projection. For keep-one-winner dedup semantics
    * see graft.ops.cdc.Compact (deterministic last-write-wins). */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** Audience overlap via THETA sketches ([[graft.functions.
    * ThetaSketchAgg]]): customers who ordered in 1997-Q1 vs 1997-Q2 —
    * |A|, |B|, |A∪B|, |A∩B|, |A\B| all derived from TWO mergeable
    * blobs. The 100 TB story: the exact forms (q_set_intersect /
    * q_set_except above) shuffle distinct ROWS; the sketch forms
    * shuffle one bounded blob per partition and the set algebra runs
    * on blobs — and unlike HLL, theta supports intersection/difference
    * directly (inclusion-exclusion on HLL compounds error). This
    * fixture runs in the sketch's EXACT regime (distinct custkeys ≪
    * nominalEntries=4096, theta=1, every hash retained — probed via
    * isExact in the spec), so the oracle compares EXACT DuckDB set
    * cardinalities as longs: the hash match certifies the entire
    * sketch pipeline end-to-end with zero tolerance. Above the
    * threshold the published 1/sqrt(k) band applies (spec forces that
    * regime and asserts it). */
  def qSetThetaAudience(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.ThetaSketchAgg.register(spark)
    // k=65536 keeps the fixture in EXACT mode at every driver scale
    // (4,756 distinct custkeys per quarter at sf0.1, probed) — the
    // union helper must build at the same k or IT would downsample
    val k = 65536
    val theta = (c: org.apache.spark.sql.Column) =>
      graft.functions.ThetaSketchAgg.theta_agg(c, k)
    def quarter(from: String, until: String) =
      Tables.table(spark, dir, "orders")
        .filter($"o_orderdate" >= lit(from).cast("timestamp") &&
          $"o_orderdate" < lit(until).cast("timestamp"))
        .select($"o_custkey")
    val a = quarter("1997-01-01", "1997-04-01")
      .agg(theta($"o_custkey").as("sa"))
    val b = quarter("1997-04-01", "1997-07-01")
      .agg(theta($"o_custkey").as("sb"))
    val est = udf { (blob: Array[Byte]) =>
      math.round(graft.functions.ThetaSketchAgg.estimate(blob)) }
    val estOp = udf { (x: Array[Byte], y: Array[Byte], op: String) =>
      math.round(graft.functions.ThetaSketchAgg.estimate(op match {
        case "u" => graft.functions.ThetaSketchAgg.union(x, y, 65536)
        case "i" => graft.functions.ThetaSketchAgg.intersect(x, y)
        case _   => graft.functions.ThetaSketchAgg.aNotB(x, y)
      })) }
    a.crossJoin(b).select(
      est($"sa").as("n_a"), est($"sb").as("n_b"),
      estOp($"sa", $"sb", lit("u")).as("n_union"),
      estOp($"sa", $"sb", lit("i")).as("n_intersect"),
      estOp($"sa", $"sb", lit("d")).as("n_diff"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set_theta_audience" -> (qSetThetaAudience _),
    "q_set_union" -> (qSetUnion _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _),
    "q_distinct" -> (qDistinct _)
  )

  val oracle: Map[String, String] = Map(
    // the sketch runs in its EXACT regime at this cardinality, so the
    // oracle's exact set cardinalities must match with zero tolerance
    "q_set_theta_audience" ->
      """WITH a AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-04-01'),
        |b AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-04-01'
        |    AND o_orderdate < TIMESTAMP '1997-07-01')
        |SELECT
        |  (SELECT count(*) FROM a) AS n_a,
        |  (SELECT count(*) FROM b) AS n_b,
        |  (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_diff""".stripMargin,
    "q_set_union" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS id, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
        |) ORDER BY src, id""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey AS k FROM orders
        |INTERSECT
        |SELECT user_id AS k FROM events
        |ORDER BY k""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT user_id AS k FROM events
        |ORDER BY k""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  )
}
