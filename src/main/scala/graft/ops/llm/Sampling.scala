package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling and dataset splitting — the data-mixing
  * machinery of a training pipeline. Everything keys off a PORTABLE
  * content hash of the row id (md5 prefix, PARITY rule 19), never
  * `rand()`: the same row lands in the same sample/split on every run,
  * on every engine, at every scale factor — re-running a 100 TB mix
  * job is reproducible and incremental by construction (new rows get
  * sampled, old rows keep their fate).
  *
  * Scale shape: a narrow projection + filter per row — no shuffle, no
  * driver state, pushdown-friendly.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the row id: salt keeps
    * independent decisions (sample vs split) uncorrelated. md5-prefix
    * (28 bits) so the oracle reproduces it bit-for-bit. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    pmod(conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 7),
      16, 10).cast("long"), lit(buckets.toLong))
  }

  /** Per-stratum keep rate in percent: a row survives iff its hash
    * bucket (0–99) falls below its stratum's rate. Exact in
    * expectation, deterministic in fact — the up/down-sampling knob of
    * a data-mixing config (e.g. downweight a boilerplate-heavy crawl,
    * upweight a rare language). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratesPct: Map[String, Int], defaultPct: Int,
                       salt: String = "sample"): DataFrame = {
    (ratesPct.values.toSeq :+ defaultPct).foreach(r =>
      require(r >= 0 && r <= 100, s"rate must be in [0,100], got $r"))
    val rate = ratesPct.foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(col(idCol), salt, 100))
      .filter(col("sample_bucket") < rate)
  }

  /** Deterministic train/val/test assignment: thresholds are
    * cumulative percents (e.g. 80, 90 → 80% train, 10% val, 10% test).
    * Independent of any sampling decision via its own salt. */
  def assignSplit(id: Column, trainPct: Int, valPct: Int,
                  salt: String = "split"): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"trainPct + valPct must be <= 100, got $trainPct + $valPct")
    val b = hashBucket(id, salt, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic weight-proportional sampling — PRIORITY sampling
    * (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    * q = w/u with u a uniform in (0,1], and the k highest-priority
    * rows per stratum are the sample (long docs proportionally more
    * likely, every decision reproducible). u comes from the row id's
    * md5 prefix (PARITY rule 19) — never `rand()`, so the same doc
    * keeps its fate across runs/engines/scales, exactly like
    * [[hashBucket]]; 12 hex digits (48 bits) so u=0 is impossible in
    * practice and the +1 guard makes it impossible in fact.
    *
    * Cross-engine exactness: priority = w/(h+1) is ONE double
    * division of two exact integers — correctly rounded identically
    * on both engines (the q_ts_seasonal value_idx rule); ties break
    * by doc id. Scale shape: narrow projection + per-stratum top-k
    * window — the stratum count bounds parallelism, and a global
    * sample composes via the two-phase sub-bucket trick (q_llm_quota)
    * when a stratum is the whole corpus. */
  def priorityColumn(id: Column, weight: Column,
                     salt: String = "wsamp"): Column =
    weight.cast("double") /
      (conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 12),
        16, 10).cast("long") + 1L).cast("double")

  /** Oracled priority sample: top-10 docs per language by token-count
    * weight, selected TWO-PHASE (64 sub-buckets rank in parallel, the
    * global rank sees ≤ 64·k candidates — the q_llm_quota shape, so a
    * corpus-sized stratum never serializes on one task). Emits the
    * priority so the ORDERING itself is certified, not just the
    * membership. */
  def qLlmSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val docs = Tables.table(spark, dir, "documents")
      .select($"lang", $"doc_id",
        size(split($"text", " ")).cast("long").as("w_tokens"))
      .withColumn("priority", priorityColumn($"doc_id", $"w_tokens"))
    val sub = Window.partitionBy($"lang", pmod(xxhash64($"doc_id"), lit(64)))
      .orderBy($"priority".desc, $"doc_id".asc)
    val global = Window.partitionBy($"lang")
      .orderBy($"priority".desc, $"doc_id".asc)
    docs.withColumn("srk", row_number().over(sub))
      .filter($"srk" <= k)
      .withColumn("rk", row_number().over(global))
      .filter($"rk" <= k)
      .select($"lang", $"rk", $"doc_id", $"w_tokens",
        round($"priority" * 1e9, 4).as("priority_scaled"))
      .orderBy($"lang", $"rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_sample_weighted" -> (qLlmSampleWeighted _)
  )

  val oracle: Map[String, String] = Map(
    // same md5-prefix uniform, same single exact division, QUALIFY top-k
    "q_llm_sample_weighted" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS w_tokens
        |  FROM documents),
        |p AS (
        |  SELECT lang, doc_id, w_tokens,
        |    w_tokens::DOUBLE /
        |      (('0x' || substring(md5('wsamp:' || doc_id), 1, 12))::BIGINT
        |        + 1)::DOUBLE AS priority
        |  FROM d)
        |SELECT lang,
        |  row_number() OVER (PARTITION BY lang
        |                     ORDER BY priority DESC, doc_id ASC) AS rk,
        |  doc_id, w_tokens,
        |  round(priority * 1e9, 4) AS priority_scaled
        |FROM p
        |QUALIFY rk <= 10
        |ORDER BY lang, rk""".stripMargin
  )
}
