package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-F sort / limit / top-k.
  *
  * Scale notes: global sort is a range-partitioned sort (sampled range
  * boundaries → shuffle → per-partition sort) — scales linearly.
  * orderBy().limit(k) compiles to TakeOrderedAndProject: per-partition
  * top-k heaps + driver merge of k×partitions rows — never a full
  * global sort. Plan-asserted in SortLimitSpec.
  */
object SortLimit {

  /** Global multi-key sort, mixed asc/desc, explicit null placement. */
  def qSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "customer")
      .select(
        $"c_custkey",
        nullif($"c_mktsegment", lit("AUTOMOBILE")).as("seg"),
        $"c_acctbal")
      .orderBy($"seg".asc_nulls_first, $"c_acctbal".desc, $"c_custkey".asc)
  }

  /** Global top-k → TakeOrderedAndProject (no full sort). */
  def qTopkGlobal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  /** Pagination: stable total order + offset/limit (Spark 4 offset). */
  def page(df: DataFrame, sortCols: Seq[String], pageSize: Int, pageIdx: Int): DataFrame =
    df.orderBy(sortCols.map(col): _*).offset(pageIdx * pageSize).limit(pageSize)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort" -> (qSort _),
    "q_topk_global" -> (qTopkGlobal _)
  )

  val oracle: Map[String, String] = Map(
    "q_sort" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'AUTOMOBILE') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""".stripMargin,
    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin
  )
}
