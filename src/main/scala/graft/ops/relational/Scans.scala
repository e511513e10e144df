package graft.ops.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** §2-A scans, sources, sinks.
  *
  * Scale notes: both oracled keys exercise the DataSource V2 parquet
  * path — q_scan_pruned is the canonical "filters + projection reach
  * the reader" witness (plan-asserted in ScansSpec: PushedFilters +
  * narrowed ReadSchema). At 100 TB the difference between scanning 3
  * columns and 11 is the job.
  */
object Scans {

  /** Row counts of all 10 corpus tables via a unioned per-table agg. */
  def qScanParquet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.names.map { n =>
      Tables.table(spark, dir, n)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(n).as("tbl"), $"n_rows")
    }.reduce(_ unionAll _).orderBy("tbl")
  }

  /** Column-pruned, predicate-pushed scan: 3 of 11 lineitem columns. */
  def qScanPruned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .where($"l_extendedprice" > 90000.0)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** CSV source with explicit schema (connector-dump ingestion path). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, dateFormat: String = "yyyy-MM-dd"): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("dateFormat", dateFormat)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** JSON-lines source with explicit schema (CDC envelope transport). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet sink — hive-style layout so downstream reads
    * get static + dynamic partition pruning on the partition column. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC source/sink (built-in columnar alternative; same pushdown +
    * pruning machinery as parquet — ScansSpec asserts PushedFilters
    * reach the ORC scan too). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet" -> (qScanParquet _),
    "q_scan_pruned" -> (qScanPruned _)
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      Tables.names.map(n => s"SELECT '$n' AS tbl, count(*) AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),
    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_extendedprice > 90000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
