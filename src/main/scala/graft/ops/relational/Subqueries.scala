package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Subquery + reshaping surface: scalar/IN/correlated subqueries (via
  * spark.sql over registered views — Catalyst decorrelates), pivot /
  * unpivot, and the SQL-text entry path.
  *
  * Scale notes: Catalyst rewrites the correlated EXISTS into a left
  * semi join and the scalar subquery into a (broadcast) aggregate
  * join — asserted in SubqueriesSpec; nothing executes per-row.
  */
object Subqueries {

  private def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(text)
  }

  /** Scalar subquery: orders well above the global average price.
    * 1.5× (not 3×) so the key is non-vacuous: it returns rows at every
    * test SF — a hash match on an empty result would validate only the
    * plumbing, not the decorrelation semantics (round-3 VERDICT). */
  def qSubqueryScalar(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)

  /** IN-subquery: customers whose nation hosts a supplier. */
  def qSubqueryIn(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
        |ORDER BY c_custkey""".stripMargin)

  /** Correlated EXISTS: parts that ship in quantity > 49. */
  def qSubqueryExists(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin)

  /** Pivot: order counts per status × priority matrix. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderpriority")
  }

  /** Unpivot (melt): wide per-part numeric columns → long (col, val). */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      .select($"p_partkey", $"p_size".cast("double").as("size"),
        $"p_retailprice".as("retailprice"))
      .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
        "measure", "value")
      .orderBy($"p_partkey", $"measure")
  }

  /** SQL-text entry: the multi-join star query through the parser. */
  def qSqlEntry(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT r_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin)

  /** LATERAL correlated subquery in FROM — the "top-n per outer row"
    * SQL idiom (Spark 3.2+ LATERAL support; Catalyst decorrelates to
    * a ranked join, never a per-row re-execution). Top-2 customers by
    * balance per nation; ordering ties broken by name so the LIMIT
    * cut is deterministic on both engines; acctbal is a RAW parquet
    * double (bit-identical cross-engine — PARITY rule 28). */
  def qLateral(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c.c_acctbal DESC, c.c_name""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lateral" -> (qLateral _),
    "q_subquery_scalar" -> (qSubqueryScalar _),
    "q_subquery_in" -> (qSubqueryIn _),
    "q_subquery_exists" -> (qSubqueryExists _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_sql_entry" -> (qSqlEntry _)
  )

  val oracle: Map[String, String] = Map(
    "q_lateral" ->
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c.c_acctbal DESC, c.c_name""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer
        |WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_exists" ->
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, measure, value FROM (
        |  SELECT p_partkey, 'size' AS measure, p_size::DOUBLE AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
        |ORDER BY p_partkey, measure""".stripMargin,
    "q_sql_entry" ->
      """SELECT r_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
  )
}
