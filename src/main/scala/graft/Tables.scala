package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus loaders for the driver test tables (schemas: FIXTURES.md §2).
  *
  * Design note (100 TB posture): every loader is a plain parquet scan —
  * Catalyst's DataSource V2 path gives vectorized reads, predicate
  * pushdown, and column pruning for free; callers declare filters/
  * projections on the returned DataFrame and the optimizer pushes them
  * into the scan. No driver-side materialization anywhere.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def load(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> table(spark, sfDir, n)).toMap

  /** Register all tables as temp views (for spark.sql-based operators). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
