package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Lexical relevance ranking and collocation mining — the retrieval
  * rungs of the text stack (data selection for pretraining and the
  * retrieval half of RAG both start from exactly these statistics):
  *
  *  - BM25 (Robertson & Zaragoza 2009; the Lucene `1 + (N-df+0.5)/
  *    (df+0.5)` idf variant so every weight is positive) against a
  *    fixed query-term set.
  *  - PMI collocations (Church & Hanks 1990): per-language top
  *    bigrams by pointwise mutual information over the bigram table's
  *    own marginals.
  *
  * Cross-engine determinism: every count is an exact BIGINT; PMI is
  * ln of a single exact-integer ratio ((c12·T)/(c1·c2) — one double
  * division, ln parity per q_llm_tfidf); BM25 composes per-term
  * doubles with identical literal operand order on both engines and
  * rounds the per-doc sum (≤ |terms| addends) to 4 dp (q_agg_stats
  * tolerance rule). Ranking windows order by the ROUNDED score with
  * full tie-breaks so both engines cut top-k identically.
  *
  * Scale shape: tokens explode narrow off the scan; BM25's shuffles
  * carry (doc, term) pairs for four terms only — the term filter runs
  * BEFORE the (doc_id, token) count shuffle, so the exchange is
  * ~|matching tokens|, never corpus-sized — and the df/avgdl sides
  * are term- and single-row frames joined by broadcast. PMI shuffles
  * (lang, w1, w2) vocabulary pairs, never text; marginals reduce the
  * already-aggregated bigram frame; per-lang totals broadcast. The
  * top-k windows run over ≤ |candidates| rows after aggregation.
  */
object Ranking {

  private val bm25Terms = Seq("table", "join", "spark", "vector")

  /** BM25 top-20 docs for the fixed query set (k1=1.2, b=0.75). */
  def qLlmBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("dl", size($"toks").cast("long"))
    val stats = base.agg(count(lit(1)).as("n"), sum($"dl").as("total"))
    val tf = base
      .select($"doc_id", $"dl", explode($"toks").as("token"))
      .filter($"token".isin(bm25Terms: _*))
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("tf"), first($"dl").as("dl"))
      // df and the scored join both reduce THIS tiny frame — without
      // the checkpoint each re-runs the corpus explode (the pmi rule)
      .localCheckpoint()
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"total".cast("double") / $"n")
      .withColumn("idf",
        log(lit(1.0) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("s",
        $"idf" * ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum($"s"), 4).as("bm25"))
    // top-k via orderBy+limit (TakeOrderedAndProject — distributed
    // partial top-k per partition, never a global window over the
    // scored frame); the rank window then runs over 20 rows
    val top = scored.orderBy($"bm25".desc, $"doc_id".asc).limit(20)
    val w = Window.orderBy($"bm25".desc, $"doc_id".asc)
    top.withColumn("rk", row_number().over(w))
      .select($"rk", $"doc_id", $"n_terms", $"bm25")
      .orderBy($"rk")
  }

  /** Per-language top-5 bigram collocations by PMI (min count 5). */
  def qLlmPmi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arr = Tables.table(spark, dir, "documents")
      .select($"lang", split($"text", " ").as("t"))
      .filter(size($"t") >= 2)
    val bg = arr.select($"lang",
      explode(transform(sequence(lit(0), size($"t") - 2),
        i => struct($"t".getItem(i).as("w1"), $"t".getItem(i + 1).as("w2"))))
        .as("b"))
      .select($"lang", $"b.w1", $"b.w2")
    // materialized ONCE (localCheckpoint, the Graph-edges pattern):
    // tot/c1/c2 and the candidate filter all reduce THIS frame — an
    // unpersisted plan would re-run the corpus-sized gram explode and
    // its shuffle four times
    val c12 = bg.groupBy($"lang", $"w1", $"w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val tot = c12.groupBy($"lang").agg(sum($"c12").as("t"))
    val c1 = c12.groupBy($"lang", $"w1").agg(sum($"c12").as("c1"))
    val c2 = c12.groupBy($"lang", $"w2").agg(sum($"c12").as("c2"))
    val cand = c12.filter($"c12" >= 5)
      .join(c1, Seq("lang", "w1"))
      .join(c2, Seq("lang", "w2"))
      .join(broadcast(tot), "lang")
      .withColumn("pmi", round(
        log(($"c12" * $"t").cast("double") /
          ($"c1" * $"c2").cast("double")), 4))
    val w = Window.partitionBy($"lang")
      .orderBy($"pmi".desc, $"w1".asc, $"w2".asc)
    cand.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"lang", $"rk", concat_ws(" ", $"w1", $"w2").as("bigram"),
        $"c12", $"pmi")
      .orderBy($"lang", $"rk")
  }

  /** ROUGE-1 overlap on DISTINCT unigrams between adjacent document
    * pairs — the eval-metric rung of the text stack (summarization /
    * paraphrase scoring reads exactly this number; the distinct-set
    * form keeps every ratio exact). Candidate = doc, reference =
    * doc+1: precision = |∩|/|cand|, recall = |∩|/|ref|, F1 =
    * 2|∩|/(|cand|+|ref|) — each ONE exact-integer division, 4 dp
    * (PARITY rule 5; no float sums exist anywhere). Shape: narrow
    * per-doc distinct-token build (the q_llm_ngram_jaccard adjacent-
    * pair join, token flavor), shuffle carries (doc, token-set)
    * pairs once. */
  def qLlmRouge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.table(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("t"))
    val a = toks.select($"doc_id".as("cand_id"), $"t".as("tc"))
    val b = toks.select(($"doc_id" - 1).as("cand_id"),
      $"doc_id".as("ref_id"), $"t".as("tr"))
    a.join(b, "cand_id")
      .withColumn("i_len", size(array_intersect($"tc", $"tr")).cast("long"))
      .withColumn("c_len", size($"tc").cast("long"))
      .withColumn("r_len", size($"tr").cast("long"))
      .select($"cand_id", $"ref_id", $"i_len", $"c_len", $"r_len",
        (expr("(10000 * i_len) DIV c_len") / 10000.0).as("p_4dp"),
        (expr("(10000 * i_len) DIV r_len") / 10000.0).as("r_4dp"),
        (expr("(20000 * i_len) DIV (c_len + r_len)") / 10000.0).as("f1_4dp"))
      .orderBy($"cand_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_rouge" -> (qLlmRouge _),
    "q_llm_bm25" -> (qLlmBm25 _),
    "q_llm_pmi" -> (qLlmPmi _)
  )

  val oracle: Map[String, String] = Map(
    // every ratio one exact-integer division (PARITY rule 5)
    "q_llm_rouge" ->
      """WITH toks AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id,
        |    len(list_intersect(a.t, b.t))::BIGINT AS i_len,
        |    len(a.t)::BIGINT AS c_len, len(b.t)::BIGINT AS r_len
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1)
        |SELECT cand_id, ref_id, i_len, c_len, r_len,
        |  ((10000 * i_len) // c_len) / 10000.0 AS p_4dp,
        |  ((10000 * i_len) // r_len) / 10000.0 AS r_4dp,
        |  ((20000 * i_len) // (c_len + r_len)) / 10000.0 AS f1_4dp
        |FROM pairs
        |ORDER BY cand_id""".stripMargin,
    // identical literal operand order in idf and the saturation
    // denominator; the per-doc sum (≤4 addends) rounds to 4 dp and
    // the cut window orders by the ROUNDED score with doc_id ties
    "q_llm_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' '))::BIGINT AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS total FROM base),
        |tf AS (
        |  SELECT doc_id, token, count(*)::BIGINT AS tf,
        |    any_value(dl) AS dl FROM (
        |    SELECT doc_id, dl, unnest(toks) AS token FROM base)
        |  WHERE token IN ('table', 'join', 'spark', 'vector')
        |  GROUP BY doc_id, token),
        |df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
        |scored AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_terms,
        |    round(sum(
        |      ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |        * (tf * 2.2)
        |        / (tf + 1.2 * (0.25 + 0.75 * dl / (total::DOUBLE / n)))
        |    ), 4) AS bm25
        |  FROM tf JOIN df USING (token), stats
        |  GROUP BY doc_id)
        |SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rk,
        |  doc_id, n_terms, bm25
        |FROM scored
        |QUALIFY rk <= 20
        |ORDER BY rk""".stripMargin,
    // pmi = ln of ONE exact-integer ratio: products stay BIGINT, a
    // single double division, ln parity per q_llm_tfidf
    "q_llm_pmi" ->
      """WITH arr AS (
        |  SELECT lang, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT lang,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> struct_pack(w1 := t[i + 1], w2 := t[i + 2]))) AS b
        |  FROM arr),
        |c12 AS (
        |  SELECT lang, b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS c12
        |  FROM bg GROUP BY 1, 2, 3),
        |tot AS (SELECT lang, sum(c12)::BIGINT AS t FROM c12 GROUP BY lang),
        |c1 AS (
        |  SELECT lang, w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1, 2),
        |c2 AS (
        |  SELECT lang, w2, sum(c12)::BIGINT AS c2 FROM c12 GROUP BY 1, 2)
        |SELECT lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY round(ln((c12 * t)::DOUBLE / (c1 * c2)::DOUBLE), 4)
        |      DESC, w1 ASC, w2 ASC) AS rk,
        |  w1 || ' ' || w2 AS bigram, c12,
        |  round(ln((c12 * t)::DOUBLE / (c1 * c2)::DOUBLE), 4) AS pmi
        |FROM c12
        |JOIN c1 USING (lang, w1) JOIN c2 USING (lang, w2)
        |JOIN tot USING (lang)
        |WHERE c12 >= 5
        |QUALIFY rk <= 5
        |ORDER BY lang, rk""".stripMargin
  )
}
