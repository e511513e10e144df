package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact-quota stratified sampling: exactly k docs per stratum,
  * chosen by a deterministic content-hash ranking — the OTHER half of
  * the data-mixing story. [[Sampling.stratifiedSample]] keeps a RATE
  * per stratum (exact in expectation); a mixture config that says
  * "exactly 30 documents per language" needs a quota, and taking
  * "the k smallest md5(salt:id)" makes the quota deterministic across
  * runs, engines, and scale factors (a uniform random k-subset in
  * distribution, reproducible in fact — no rand()).
  *
  * Scale shape: the naive per-stratum ranking window is ONE task per
  * stratum (a language is corpus-sized — the serialization killer),
  * so selection runs TWO-PHASE: each of 64 hash sub-buckets ranks its
  * own slice and emits its local top-k (parallel, bounded), then the
  * global per-stratum rank runs over ≤ 64·k candidate rows. Identical
  * result to the one-window form BY CONSTRUCTION (the global top-k is
  * a subset of every sub-bucket's top-k) — which is exactly what the
  * oracle's one-window QUALIFY certifies. */
object Quota {

  /** Exactly 30 docs per language, ranked by md5("quota:" || doc_id). */
  def qLlmQuota(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 30
    val ranked = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"lang",
        md5(concat(lit("quota:"), $"doc_id".cast("string"))).as("h"))
    val sub = Window.partitionBy($"lang", pmod(xxhash64($"doc_id"), lit(64)))
      .orderBy($"h".asc, $"doc_id".asc)
    val candidates = ranked
      .withColumn("srk", row_number().over(sub))
      .filter($"srk" <= k)
    val global = Window.partitionBy($"lang").orderBy($"h".asc, $"doc_id".asc)
    candidates
      .withColumn("rk", row_number().over(global))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"doc_id", $"h")
      .orderBy($"lang", $"rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_quota" -> (qLlmQuota _)
  )

  val oracle: Map[String, String] = Map(
    // the oracle runs the ONE-window form — the hash match proves the
    // two-phase decomposition selects the identical k per stratum
    "q_llm_quota" ->
      """SELECT lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('quota:' || doc_id::VARCHAR) ASC, doc_id ASC) AS rk,
        |  doc_id, md5('quota:' || doc_id::VARCHAR) AS h
        |FROM documents
        |QUALIFY rk <= 30
        |ORDER BY lang, rk""".stripMargin
  )
}
