package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-H UDF / UDTF surface.
  *
  * Scale note: a Scala UDF is opaque to Catalyst — no pushdown through
  * it, no codegen fusion. Acceptable here because normalization feeds
  * a full-corpus pipeline anyway (nothing to push down); the 100 TB
  * upgrade path is a Catalyst Expression with doGenCode (SURVEY §4.3).
  * The generator side needs no custom UDTF: explode/posexplode are
  * built-in Generators that run inside codegen.
  */
object TextUdf {

  /** Text normalizer: lowercase, strip non-alphanumerics, collapse
    * whitespace. The canonical pre-dedup cleaner (reused by ops.llm). */
  val normalizeText: UserDefinedFunction = udf { s: String =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll("\\s+", " ").trim
  }

  /** Pure-Column twin of normalizeText — codegen-friendly (no UDF
    * serialization barrier); used where plan transparency matters. */
  def normalizeTextCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), "\\s+", " "))

  def qUdfScalar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "part")
      .select(
        $"p_partkey",
        normalizeText(concat_ws(" ", $"p_brand", $"p_type", $"p_name")).as("norm"))
      .orderBy($"p_partkey")
  }

  def qUdtfExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
      .orderBy($"doc_id", $"pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scalar" -> (qUdfScalar _),
    "q_udtf_explode" -> (qUdtfExplode _)
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT p_partkey,
        |  trim(regexp_replace(regexp_replace(
        |    lower(concat_ws(' ', p_brand, p_type, p_name)),
        |    '[^a-z0-9 ]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_udtf_explode" ->
      """SELECT doc_id,
        |  unnest(generate_series(1, len(toks))) - 1 AS pos,
        |  unnest(toks) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
