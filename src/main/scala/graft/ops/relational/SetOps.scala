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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_set_union" -> (qSetUnion _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _),
    "q_distinct" -> (qDistinct _)
  )

  val oracle: Map[String, String] = Map(
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
