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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_basic" -> (qAggBasic _)
  )

  val oracle: Map[String, String] = Map(
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
