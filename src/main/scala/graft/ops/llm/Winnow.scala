package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003) — the guarantee-bearing member of the fingerprint
  * family: selecting the RIGHTMOST minimum hash from every window of
  * w consecutive k-gram hashes guarantees that any match of length
  * ≥ w+k−1 tokens shares at least one selected fingerprint, with
  * density ≤ 2/(w+1). The rolling-hash fingerprint (q_llm_fingerprint)
  * is order-sensitive but all-or-nothing; MinHash is set-similarity;
  * winnowing is what plagiarism/clone detection actually ships.
  *
  * Cross-engine determinism: gram hashes are the md5-prefix PARITY
  * rule; the window minimum and the rightmost-tie pick are exact
  * integer selections; selected positions are NON-DECREASING as the
  * window slides (the selection in window i+1 can never move left of
  * window i's — both windows contain any shared minimum), so
  * duplicate selections are CONSECUTIVE and dedup is the
  * neighbor-inequality filter, not a distinct whose order guarantee
  * differs per engine. The digest md5s the ordered pos:hash stream,
  * certifying every selection bit-for-bit.
  *
  * Scale shape: entirely shuffle-free narrow per-doc array work (the
  * token array materialized FIRST — lambda-inlining rule; grams,
  * hashes, window mins, and the dedup are per-row lambdas over it);
  * the only exchange is the presentation orderBy. At 100 TB this is
  * a map-only pass — the fingerprint INDEX (fp → doc postings) that
  * a matcher joins on is exactly q_llm_boilerplate's gram-keyed
  * shuffle shape and composes from this output when needed. */
object Winnow {

  private val K = 4 // tokens per gram
  private val W = 4 // hashes per window

  /** Per-doc winnowed fingerprints: count + order-certifying digest. */
  def qLlmWinnow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gramHash = (t: Column, i: Column) =>
      conv(substring(md5(concat_ws(" ",
        element_at(t, i + 1), element_at(t, i + 2),
        element_at(t, i + 3), element_at(t, i + 4))), 1, 7), 16, 10)
        .cast("long")
    val arr = Tables.table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= K + W - 1) // ≥ one full window (W grams needs
      // W+K-1 tokens — exactly the guarantee's minimum match length)
      .withColumn("h",
        transform(sequence(lit(0), size($"t") - K), i => gramHash($"t", i)))
    val winPick = (h: Column, i: Column) => {
      val m = array_min(slice(h, i + 1, lit(W)))
      val pos = array_max(filter(sequence(i, i + W - 1),
        p => element_at(h, p + 1) === m))
      concat_ws(":", pos, m)
    }
    arr
      .withColumn("raw", transform(
        sequence(lit(0), size($"h") - W), i => winPick($"h", i)))
      .withColumn("sel", filter($"raw",
        (s, j) => j === 0 || s =!= element_at($"raw", j)))
      .select($"doc_id", size($"h").cast("long").as("n_grams"),
        size($"sel").cast("long").as("n_fp"),
        md5(array_join($"sel", ",")).as("fp_digest"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_winnow" -> (qLlmWinnow _)
  )

  val oracle: Map[String, String] = Map(
    // same md5-prefix gram hashes, same rightmost-min window pick,
    // same neighbor-inequality dedup over the ordered selections
    "q_llm_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 7),
        |h AS (
        |  SELECT doc_id, list_transform(range(len(tk) - 3), i ->
        |    ('0x' || substring(md5(
        |      tk[i + 1] || ' ' || tk[i + 2] || ' ' ||
        |      tk[i + 3] || ' ' || tk[i + 4]), 1, 7))::BIGINT) AS hs
        |  FROM t),
        |raw AS (
        |  SELECT doc_id, hs, list_transform(range(len(hs) - 3), i ->
        |    list_max(list_filter([i, i + 1, i + 2, i + 3],
        |      p -> hs[p + 1] = list_min(hs[i + 1:i + 4])))
        |    || ':' ||
        |    list_min(hs[i + 1:i + 4])) AS r
        |  FROM h),
        |sel AS (
        |  SELECT doc_id, len(hs)::BIGINT AS n_grams,
        |    list_filter(r, (s, j) -> j = 1 OR s != r[j - 1]) AS s
        |  FROM raw)
        |SELECT doc_id, n_grams, len(s)::BIGINT AS n_fp,
        |  md5(array_to_string(s, ',')) AS fp_digest
        |FROM sel ORDER BY doc_id""".stripMargin
  )
}
