package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-wide repeated-span mining — the exact-substring rung of the
  * dedup ladder (the published dedup-training-data recipe: spans
  * repeated VERBATIM across documents are boilerplate/templates, and
  * per-doc near-dup similarity cannot see them when the rest of the
  * documents differ). A doc's `boiler_frac` is the fraction of its
  * 8-gram occurrences whose gram also appears in at least one OTHER
  * document — the quality signal a filtering pipeline thresholds on.
  *
  * Scale shape: the gram build is narrow (windowed indexing over the
  * materialized token array — no shuffle); occurrences pre-aggregate
  * per (doc, gram) BEFORE the gram-keyed shuffle, so a hot gram
  * contributes one row per containing doc, never one per occurrence
  * (the pair-key de-skew rule from the bigram LM); the shared-gram set
  * is vocabulary-sized and joins back on the same gram key. Nothing
  * materializes cross-doc pairs — corpus-frequency mining is linear
  * where pairwise dedup is quadratic, which is exactly why it is the
  * scalable first pass at 100 TB.
  */
object Boilerplate {

  /** Per-doc boilerplate contamination from cross-doc repeated
    * 8-grams: total gram occurrences, occurrences of shared grams,
    * and their ratio. Docs under 8 tokens carry no 8-gram and are
    * excluded on both engines. */
  def qLlmBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 8)
    val grams = docs.select($"doc_id", (size($"t") - 7).as("n_grams"),
      explode(transform(sequence(lit(0), size($"t") - 8),
        i => concat_ws(" ", (0 to 7).map(k => $"t".getItem(i + k)): _*)))
        .as("g"))
    // one row per (doc, gram) BEFORE the gram-keyed shuffle: the
    // hot-gram side is bounded by docs-containing, not occurrences
    val perDoc = grams.groupBy($"doc_id", $"g")
      .agg(max($"n_grams").as("n_grams"), count(lit(1)).as("occ"))
    // containing-doc count per gram as a whole-partition window over
    // perDoc (distinct per (doc, g), so count(*) IS the doc count) —
    // NOT a groupBy + join-back, which would evaluate the gram explode
    // twice (column pruning makes the two subtrees differ, defeating
    // exchange reuse): same single shuffle on g, half the scan work
    val wg = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    perDoc.withColumn("nd", count(lit(1)).over(wg))
      .groupBy($"doc_id")
      .agg(max($"n_grams").as("n_grams"),
        sum(when($"nd" >= 2, $"occ").otherwise(lit(0L)))
          .as("n_boiler"))
      .select($"doc_id", $"n_grams", $"n_boiler",
        round($"n_boiler" / $"n_grams", 4).as("boiler_frac"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_boilerplate" -> (qLlmBoilerplate _)
  )

  val oracle: Map[String, String] = Map(
    // t[i:i+7] is the 1-based inclusive 8-token slice; string_agg over
    // it equals Spark's concat_ws over getItem(i..i+7)
    "q_llm_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, len(t) - 7 AS n_grams,
        |    list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        |  FROM toks, unnest(range(1, len(t) - 6)) AS r(i)
        |  WHERE len(t) >= 8),
        |per_doc AS (
        |  SELECT doc_id, g, max(n_grams) AS n_grams, count(*) AS occ
        |  FROM grams GROUP BY doc_id, g),
        |shared AS (
        |  SELECT g FROM per_doc GROUP BY g HAVING count(*) >= 2)
        |SELECT d.doc_id, max(d.n_grams)::BIGINT AS n_grams,
        |  sum(CASE WHEN s.g IS NOT NULL THEN d.occ ELSE 0 END)::BIGINT
        |    AS n_boiler,
        |  round(sum(CASE WHEN s.g IS NOT NULL THEN d.occ ELSE 0 END)
        |    / max(d.n_grams), 4) AS boiler_frac
        |FROM per_doc d LEFT JOIN shared s ON d.g = s.g
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
