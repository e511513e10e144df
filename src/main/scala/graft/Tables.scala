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

  // Memoized per (session, dir, name) — the registerAll rationale
  // extended to the DataFrame loaders (optimization r19): every
  // spark.read.parquet re-infers the schema from a footer read, and a
  // full bench sweep makes ~2000 table() calls of pure fixed overhead.
  // The memo holds the LAZY read plan (schema + file listing), never
  // data — each query still computes from the parquet bytes; the
  // corpus is immutable for a session's lifetime by the driver
  // contract. LIFETIME (r19 ADVICE): despite the WeakHashMap, entries
  // are EFFECTIVELY STRONG — each DataFrame value references its
  // SparkSession (the key) through QueryExecution, so the value→key
  // chain defeats weak eviction and a dropped session stays pinned.
  // Accepted deliberately: the driver mains build a handful of
  // sessions per JVM and an entry is a lazy plan (≤ dirs × 10 tables,
  // a few KB each), so the bound is small and static; a multi-session
  // server would wrap values in WeakReference and re-read on miss.
  private val tableMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]())

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tableMemo.synchronized {
      val perSession = Option(tableMemo.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[(String, String), DataFrame]
        tableMemo.put(spark, m)
        m
      }
      perSession.getOrElseUpdate((sfDir, name), {
        // events.ts is parquet TIMESTAMP(NANOS); Spark 4.x rejects it as
        // PARQUET_TYPE_ILLEGAL unless read as raw nanos-since-epoch longs.
        // We convert to TimestampType (µs) — every oracled query further
        // date_trunc's to ≥ seconds, so the ns→µs truncation is invisible
        // to the DuckDB compare (SURVEY.md §5.4).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        if (name == "events" &&
            df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        else df
      })
    }

  def load(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> table(spark, sfDir, n)).toMap

  // Last dir registered per live session. WeakHashMap so a dropped
  // session doesn't pin its entry; synchronized for cross-thread callers.
  private val lastRegistered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Register all tables as temp views (for spark.sql-based operators).
    *
    * Memoized per (session, dir): registration triggers a parquet
    * footer/schema read per table, and the SQL-path operators each call
    * this — without the memo a 4-query batch pays 40 footer reads of
    * pure fixed overhead. Re-registers only when the dir changes (temp
    * view names are session-global, so switching scale factors must
    * rebind them).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    lastRegistered.synchronized {
      if (lastRegistered.get(spark) != sfDir) {
        names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
        lastRegistered.put(spark, sfDir): Unit
      }
    }
}
