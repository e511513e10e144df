package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis (§2-K / task brief): language-ID, token counting,
  * document fingerprinting. Heuristic/seeded operators — scalatest-
  * validated (quality scoring is oracled separately as q_llm_quality).
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, graft.Ws.Plus))

  /** BPE-ish subword count: split on whitespace AND letter/digit
    * boundaries — approximates subword token inflation vs plain words
    * (a cheap stand-in for a real tokenizer's token count). */
  def subwordCount(textCol: Column): Column =
    size(split(textCol, graft.Ws.Plus + "|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"))

  /** Quality band from word/stopword counts — the SINGLE source of the
    * banding rules: oracled in q_llm_quality, filtered on in
    * CorpusPipeline. Changing a threshold here changes both, so the
    * shipped corpus can never drift from what the cross-engine-verified
    * quality query says survives. */
  def qualityBand(nWords: Column, nStop: Column, minWords: Int = 20): Column =
    when(nWords < minWords, "short")
      .when(nStop * 5 > nWords, "boilerplate")
      .otherwise("ok")

  /** N-gram-profile language ID: build per-language token profiles
    * from a labelled corpus (top-N tokens by tf), then classify by
    * profile-overlap score. Profiles are a broadcast-sized table —
    * classification is a broadcast join, no shuffle of the corpus.
    *
    * `splitPattern` defaults to whitespace-runs; the oracled twin
    * (q_llm_langid) passes a single space to match the corpus's
    * single-space tokenization on both engines (PARITY precedent:
    * q_llm_tf). Both build and classify are fully deterministic:
    * profile ties break (cnt desc, token asc), classification ties
    * (score desc, lang asc). */
  def buildProfiles(labelled: DataFrame, langCol: String, textCol: String,
                    topN: Int = 20, splitPattern: String = graft.Ws.Plus): DataFrame = {
    val tok = labelled.select(col(langCol).as("lang"),
      explode(split(lower(col(textCol)), splitPattern)).as("t"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("t").asc)
    tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .groupBy(col("lang"))
      .agg(array_sort(collect_list(col("t"))).as("profile"))
  }

  /** Classify each doc to the language whose profile overlaps its
    * token set most (ties → lexicographically first language).
    *
    * Argmax via `min(struct(-score, lang))` instead of a row_number
    * window: the aggregate partial-combines map-side, so the shuffle
    * carries one (doc_id, int, lang) row per doc instead of
    * |docs|×|langs| rows still holding the token arrays (the same
    * 2.3× pattern as Knn's IVF assignment). min of (-score, lang)
    * keeps the (score desc, lang asc) tie-break exactly. */
  def classifyLanguage(docs: DataFrame, profiles: DataFrame,
                       idCol: String, textCol: String,
                       splitPattern: String = graft.Ws.Plus): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"),
      array_distinct(split(lower(col(textCol)), splitPattern)).as("toks"))
    val scored = d.crossJoin(broadcast(profiles))
      .select(col("doc_id"), col("lang"),
        size(array_intersect(col("toks"), col("profile"))).as("score"))
    scored.groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("lang").as("lang"))).as("best"))
      .select(col("doc_id"), col("best.lang").as("pred_lang"),
        (-col("best.ns")).as("score"))
  }

  /** Rolling polynomial fingerprint of the token stream (order-
    * sensitive, unlike a bag-of-words hash): fold over tokens of
    * (acc * 31 + tokenHash(t)) mod 1e9+7. Deterministic per content.
    *
    * @param tokenHash per-token 64-bit-safe hash; default xxhash64
    *                  (fastest — codegen'd). Pass [[portableTokenHash]]
    *                  when the fingerprint must reproduce outside Spark.
    */
  def rollingFingerprint(textCol: Column,
                         tokenHash: Column => Column = xxhash64(_)): Column = {
    // modulus small enough that acc*31 + h never overflows a long
    // (Spark 4 runs ANSI mode: long overflow throws, not wraps)
    val m = lit(1000000007L)
    aggregate(
      split(textCol, graft.Ws.Plus),
      lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(tokenHash(t), m), m))
  }

  /** Engine-portable token hash: first 7 hex chars of md5 as a long
    * (28 bits — keeps the fold's `acc*31 + h` far from long overflow).
    * md5 is bit-identical across engines, unlike xxhash64 whose seed
    * is Spark-specific (PARITY.md rule 19). */
  def portableTokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")
}
