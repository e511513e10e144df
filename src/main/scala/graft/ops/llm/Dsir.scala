package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** DSIR-style importance weights for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how target-like its token distribution
  * is — the mean per-token log-likelihood ratio between a TARGET
  * domain model and the RAW corpus model, both Laplace-smoothed
  * unigram models estimated from the data itself (the paper's hashed
  * n-gram features, at the unigram rung the oracle can replay). The
  * English subcorpus stands in as the target domain; a real pipeline
  * swaps in its curated target set — the algebra is unchanged.
  *
  * Cross-engine determinism: each token's ratio is ln of ONE
  * exact-integer ratio — ln(((ct+1)·(Traw+V)) / ((cr+1)·(Ttgt+V))),
  * products stay BIGINT (≪ 2^63 at any corpus this fits), a single
  * double division, ln parity per q_llm_tfidf; the per-doc MEAN sums
  * identical doubles and rounds 4 dp (the q_llm_bigram_lm rule).
  *
  * Scale shape: ONE (token) count shuffle builds BOTH models (the
  * target count is a conditional agg of the same pass —
  * vocabulary-sized output); the per-token weight table is
  * vocabulary-sized and joins the exploded corpus BY TOKEN (broadcast
  * at any realistic vocab); the only doc-sized exchange is the final
  * per-doc mean — (doc_id, double) pairs, never text. The V/T scalars
  * ride a broadcast single-row frame. */
object Dsir {

  /** Per-doc DSIR importance weight (target = lang 'en'). */
  def qLlmDsir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("t"))
    // BOTH models from ONE (token) shuffle: the target count is a
    // conditional agg of the same pass, not a second corpus explode
    // plus a vocab join (review finding, r8)
    val model = toks.groupBy($"t").agg(
        count(lit(1)).as("cr"),
        count(when($"lang" === "en", 1)).as("ct"))
      .localCheckpoint() // the scalar agg + the corpus join read it
    val scalars = model.agg(
      count(lit(1)).as("v"), sum($"cr").as("traw"), sum($"ct").as("ttgt"))
    val weights = model.crossJoin(broadcast(scalars))
      .select($"t", log(
        (($"ct" + 1) * ($"traw" + $"v")).cast("double") /
          (($"cr" + 1) * ($"ttgt" + $"v")).cast("double")).as("w"))
    toks.join(weights, "t")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"),
        // + 0.0 canonicalizes a rounded -0.0 (the q_llm_centroid
        // negative-zero rule, via IEEE -0.0 + 0.0 = +0.0)
        (round(avg($"w"), 4) + lit(0.0)).as("dsir_weight"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_dsir" -> (qLlmDsir _)
  )

  val oracle: Map[String, String] = Map(
    // same single-division ln per token, same Laplace scalars; the
    // per-doc mean rounds 4 dp (bigram_lm rule)
    "q_llm_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |model AS (
        |  SELECT t, count(*)::BIGINT AS cr,
        |    count(*) FILTER (WHERE lang = 'en')::BIGINT AS ct
        |  FROM toks GROUP BY t),
        |scalars AS (
        |  SELECT count(*)::BIGINT AS v, sum(cr)::BIGINT AS traw,
        |    sum(ct)::BIGINT AS ttgt
        |  FROM model),
        |weights AS (
        |  SELECT t, ln(
        |    ((ct + 1) * (traw + v))::DOUBLE /
        |      ((cr + 1) * (ttgt + v))::DOUBLE) AS w
        |  FROM model, scalars)
        |SELECT doc_id, count(*)::BIGINT AS n_toks,
        |  round(avg(w), 4) + 0.0 AS dsir_weight
        |FROM toks JOIN weights USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
