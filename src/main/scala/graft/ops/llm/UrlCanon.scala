package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL canonicalization + URL-level deduplication — the step every
  * published web-corpus recipe runs BEFORE text dedup (the same page
  * arrives under tracking-parameter, case, www-prefix, and default-
  * port variants; dropping them by canonical URL is orders cheaper
  * than any content comparison).
  *
  * Canonical form, applied in a fixed order on BOTH engines:
  *   1. lowercase scheme+host (path/query stay case-sensitive),
  *   2. strip a leading `www.` host label,
  *   3. strip the default `:443` port,
  *   4. remove tracking query params (`utm_*`, `ref`) with their
  *      separator, then a dangling trailing `?`/`&`.
  *
  * Scale shape: canonicalization is a narrow per-row projection
  * (regex + string ops, whole-stage codegen); the dedup is ONE
  * groupBy on the canonical key carrying (count, min-id) partials —
  * the q_llm_dedup_exact compaction shape with the URL as the hash.
  *
  * The regexes stay inside the POSIX-safe subset (q_fn_regex rule):
  * literal classes and alternation only — identical under Java regex
  * and DuckDB's RE2 (DuckDB needs the explicit 'g' flag; Spark's
  * regexp_replace is global by default).
  */
object UrlCanon {

  /** Canonical URL as a derived column on `df` (the 4 steps above;
    * the frame names the intermediates — the tail substring is
    * indexed by the extracted prefix's length). */
  def withCanonical(df: DataFrame, urlCol: String,
                    out: String = "canonical"): DataFrame = {
    val d1 = df
      .withColumn("__sh", regexp_extract(col(urlCol), "^[A-Za-z]+://[^/]+", 0))
      .withColumn("__rest",
        col(urlCol).substr(length(col("__sh")) + 1, lit(Int.MaxValue)))
      .withColumn("__h",
        regexp_replace(
          regexp_replace(lower(col("__sh")), "://www\\.", "://"),
          ":443$", ""))
      .withColumn("__q",
        regexp_replace(
          regexp_replace(col("__rest"), "(utm_[a-z]+|ref)=[a-z0-9]*&?", ""),
          "[?&]$", ""))
    d1.withColumn(out, concat(col("__h"), col("__q")))
      .drop("__sh", "__rest", "__h", "__q")
  }

  /** Oracled URL dedup report: deterministic raw URLs are derived
    * in-query from (source, doc_id) with every variant class planted
    * — mixed-case host, www, :443 port, per-doc utm/ref params — so
    * each canonicalization step provably does work; the report groups
    * by canonical form: variant count, distinct raw forms, keeper
    * (min doc id) — the q_llm_dedup_exact presentation. */
  def qLlmUrlCanon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"source",
        concat(
          lit("https://WWW."), upper($"source"), lit(".Example.COM:443"),
          lit("/items/"), pmod($"doc_id", lit(10L)),
          lit("/?utm_campaign=c"), pmod($"doc_id", lit(7L)),
          lit("&ref=r"), pmod($"doc_id", lit(3L)),
          lit("&id="), pmod($"doc_id", lit(10L))).as("url"))
    withCanonical(raw, "url")
      .groupBy($"canonical")
      .agg(count(lit(1)).as("n_variants"),
        countDistinct($"url").as("n_raw_forms"),
        min($"doc_id").as("keeper_id"))
      .orderBy($"canonical")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_url_canon" -> (qLlmUrlCanon _)
  )

  val oracle: Map[String, String] = Map(
    // same fixed-order canonical chain; RE2 needs the explicit 'g'
    "q_llm_url_canon" ->
      """WITH raw AS (
        |  SELECT doc_id, source,
        |    'https://WWW.' || upper(source) || '.Example.COM:443' ||
        |    '/items/' || (doc_id % 10) ||
        |    '/?utm_campaign=c' || (doc_id % 7) ||
        |    '&ref=r' || (doc_id % 3) ||
        |    '&id=' || (doc_id % 10) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^[A-Za-z]+://[^/]+') AS sh
        |  FROM raw),
        |c2 AS (
        |  SELECT doc_id, url,
        |    regexp_replace(
        |      regexp_replace(lower(sh), '://www\.', '://'), ':443$', '')
        |    ||
        |    regexp_replace(
        |      regexp_replace(substr(url, length(sh) + 1),
        |        '(utm_[a-z]+|ref)=[a-z0-9]*&?', '', 'g'),
        |      '[?&]$', '') AS canonical
        |  FROM c)
        |SELECT canonical, count(*) AS n_variants,
        |  count(DISTINCT url) AS n_raw_forms,
        |  min(doc_id) AS keeper_id
        |FROM c2 GROUP BY canonical ORDER BY canonical""".stripMargin
  )
}
