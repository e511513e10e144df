package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: the configuration posture every graft
  * pipeline assumes, in one place.
  *
  * - AQE on (runtime coalescing, skew-join splitting, SMJ→broadcast)
  * - shuffle partitions sized to the machine, not the 200 default
  * - UTC session timezone (oracle/corpus contract)
  * - native function registration (graft_dot, graft_normalize_text,
  *   graft_char_shingles)
  *
  * Deliberately NOT set: `spark.sql.parquet.aggregatePushdown` — it
  * only fires on the DSv2 path (empty `useV1SourceList`), and flipping
  * every parquet read to v2 for one metadata-count win risks subtle
  * behavior changes (TIMESTAMP(NANOS) handling, mergeSchema) across
  * the whole oracled surface; the v1 count already reads struct<>
  * (row-group headers only). Measured, see BASELINE.md.
  *
  * On a real cluster the same builder applies — only master/memory
  * change; `spark.sql.extensions=graft.functions.GraftExtensions` is
  * the config-file alternative to `registerFunctions`.
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // functions AND the MERGE-statement parser (r15) at session
      // build — spark.sql("MERGE INTO <graft table> …") just works
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")

  /** Local session with graft functions registered. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession = {
    val spark = builder(cores).master(s"local[$cores]").getOrCreate()
    registerFunctions(spark)
    spark
  }

  /** Idempotently register the native graft functions. */
  def registerFunctions(spark: SparkSession): Unit = {
    functions.VectorExpressions.register(spark)
    functions.NormalizeText.register(spark)
    functions.CharShingles.register(spark)
    functions.KllSketchAgg.register(spark)
    functions.FreqSketchAgg.register(spark)
    functions.JaroWinkler.register(spark)
    functions.ThetaSketchAgg.register(spark)
    functions.MediaHash.register(spark)
  }
}
