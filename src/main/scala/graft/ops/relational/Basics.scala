package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

import graft.Tables

/** §2-B projection / filter / null-handling operators.
  *
  * All pure narrow transformations — no shuffle; Catalyst folds them
  * into the scan stage (whole-stage codegen) and pushes eligible
  * predicates into the parquet reader.
  */
object Basics {

  /** Projection with computed columns, rename, drop. */
  def qProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      // DECIMAL-domain product: avoids the Spark-vs-DuckDB double
      // rounding divergence on .xx5 boundaries (see Scalars.qFnMath)
      .withColumn("price_taxed",
        round($"p_retailprice".cast(types.DecimalType(12, 2)) * lit(BigDecimal("1.1")), 2)
          .cast(types.DoubleType))
      .withColumnRenamed("p_name", "part_name")
      .withColumn("name_upper", upper($"part_name"))
      .withColumn("size_plus", $"p_size" + 1)
      .drop("p_brand", "p_type")
      .select($"p_partkey", $"part_name", $"name_upper", $"price_taxed", $"size_plus")
      .orderBy($"p_partkey")
  }

  /** Compound predicates: AND/OR/NOT, IN, BETWEEN, LIKE, IS NOT NULL,
    * null-safe equality (<=>). */
  def qFilterPredicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .filter(
        (($"o_orderstatus" <=> lit("O")) ||
          $"o_orderpriority".isin("1-URGENT", "2-HIGH")) &&
        $"o_totalprice".between(1000.0, 300000.0) &&
        !$"o_orderpriority".like("%LOW%") &&
        $"o_custkey".isNotNull)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_orderpriority", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** coalesce / nullif / nvl2 + DataFrameNaFunctions fill. */
  def qNullHandling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seg = nullif($"c_mktsegment", lit("BUILDING"))
    Tables.table(spark, dir, "customer")
      .select(
        $"c_custkey",
        coalesce(seg, lit("(none)")).as("seg_filled"),
        nvl2(seg, lit("known"), lit("unknown")).as("seg_known"),
        nullif($"c_nationkey", lit(0)).as("nat_or_null"))
      .na.fill(Map("nat_or_null" -> -1))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_project" -> (qProject _),
    "q_filter_predicates" -> (qFilterPredicates _),
    "q_null_handling" -> (qNullHandling _)
  )

  val oracle: Map[String, String] = Map(
    "q_project" ->
      """SELECT p_partkey, p_name AS part_name, upper(p_name) AS name_upper,
        |  round(p_retailprice::DECIMAL(12,2) * 1.1, 2)::DOUBLE AS price_taxed, p_size + 1 AS size_plus
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE (o_orderstatus IS NOT DISTINCT FROM 'O'
        |       OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |  AND o_totalprice BETWEEN 1000.0 AND 300000.0
        |  AND NOT (o_orderpriority LIKE '%LOW%')
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q_null_handling" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
        |       THEN 'known' ELSE 'unknown' END AS seg_known,
        |  coalesce(nullif(c_nationkey, 0), -1) AS nat_or_null
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
