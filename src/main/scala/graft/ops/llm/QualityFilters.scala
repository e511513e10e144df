package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Published document-quality rule sets — the two standard filters
  * every web-scale pretraining pipeline runs before anything else
  * touches the text:
  *
  *  - Gopher rules (Rae et al. 2021, "Scaling Language Models", table
  *    A1): doc-level thresholds on word count, mean word length,
  *    symbol-to-word ratio, alphabetic-word fraction, and stop-word
  *    containment.
  *  - C4 rules (Raffel et al. 2019, "Exploring the Limits of Transfer
  *    Learning", §2.2): line-level keep/drop on terminal punctuation
  *    and minimum words, plus doc-level drops for code/boilerplate
  *    markers ("lorem ipsum", curly braces) and "javascript" lines.
  *
  * Every rule is evaluated in EXACT integer arithmetic (counts and
  * cross-multiplied threshold compares — `sum_len >= 3 * n_words`
  * instead of a float mean ≥ 3.0), so there is zero cross-engine
  * drift by construction; the only float columns are 2-dp display
  * values derived by the half-up integer-DIV trick (q_llm_quality
  * precedent). Scale shape: both filters are shuffle-free narrow
  * per-doc projections — at 100 TB this is a map-only pass the scan
  * fuses into whole-stage codegen; the one orderBy is presentation.
  *
  * The synthetic corpus is all-lowercase single-line alpha text, so
  * the symbol / non-alpha / multi-line / marker branches would be
  * vacuous on organic docs alone: each query PLANTS deterministic
  * fixture docs in-query (ids from max(doc_id)+1 — the
  * q_llm_repetition scale-safe pattern) so every rule fires both ways
  * and the oracle hash certifies each branch.
  */
object QualityFilters {

  private val stopWords = Seq("the", "a", "and", "of", "to", "be")

  /** Gopher doc-level quality report: exact rule metrics + keep flag.
    * Thresholds (from the paper, adapted where the corpus makes a rule
    * organically non-vacuous): 50 ≤ words ≤ 100000; 3 ≤ mean word
    * length ≤ 10; symbol-to-word ratio ≤ 0.1 (# and ...); ≥ 80% of
    * words contain an alphabetic char; ≥ 2 stop words. */
  def qLlmGopher(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val mx = docs.agg(max($"doc_id").as("mx"))
    // three planted families, each tripping one rule the corpus never
    // trips organically: symbol-heavy, digit words, overlong words
    val planted = docs.filter($"doc_id" < 5).crossJoin(broadcast(mx))
      .select(($"doc_id" + $"mx" + 1).as("doc_id"),
        concat(lit("the a "), trim(repeat(lit("spark # data ... "), 20)))
          .as("text"))
      .unionByName(docs.filter($"doc_id" < 5).crossJoin(broadcast(mx))
        .select(($"doc_id" + $"mx" + 6).as("doc_id"),
          concat(lit("the a "), trim(repeat(lit("v42 2024 x9 7 "), 15)))
            .as("text")))
      .unionByName(docs.filter($"doc_id" < 5).crossJoin(broadcast(mx))
        .select(($"doc_id" + $"mx" + 11).as("doc_id"),
          concat(lit("the a "), trim(repeat(lit("abcdefghijkl "), 60)))
            .as("text")))
    val stop = stopWords.map(lit): Seq[Column]
    docs.unionByName(planted)
      .withColumn("toks", split($"text", " "))
      .withColumn("n_words", size($"toks").cast("long"))
      .withColumn("sum_len",
        (length($"text") - (size($"toks") - 1)).cast("long"))
      .withColumn("n_sym", size(filter($"toks",
        t => t.contains("#") || t.contains("..."))).cast("long"))
      .withColumn("n_alpha", size(filter($"toks",
        t => t.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("n_stop", size(filter($"toks",
        t => t.isin(stopWords: _*))).cast("long"))
      .withColumn("mean_wl",
        expr("(200 * sum_len + n_words) DIV (2 * n_words)") / 100.0)
      .withColumn("keep",
        $"n_words" >= 50 && $"n_words" <= 100000 &&
          $"sum_len" >= $"n_words" * 3 && $"sum_len" <= $"n_words" * 10 &&
          $"n_sym" * 10 <= $"n_words" &&
          $"n_alpha" * 5 >= $"n_words" * 4 &&
          $"n_stop" >= 2)
      .select($"doc_id", $"n_words", $"mean_wl", $"n_sym", $"n_alpha",
        $"n_stop", $"keep")
      .orderBy($"doc_id")
  }

  /** C4 line-level filter report: per doc, lines partitioned into
    * exactly one of {javascript, too-short, no-terminal-punct, kept}
    * (precedence in that order, so the four counts always sum to
    * n_lines), the surviving char count, and the doc-level drop flag
    * ("lorem ipsum" / curly brace). Organic docs are one unpunctuated
    * line (all land in n_nopunct); five planted families exercise
    * kept lines, short lines, the javascript rule, and both doc-level
    * markers. */
  def qLlmC4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val mx = docs.agg(max($"doc_id").as("mx"))
    def plant(offset: Int, body: String) =
      docs.filter($"doc_id" < 4).crossJoin(broadcast(mx))
        .select(($"doc_id" + $"mx" + offset).as("doc_id"),
          lit(body).as("text"))
    val planted = plant(1,
        "the table joins the data well.\nshort line.\n" +
          "spark scans run fast and clean.")
      .unionByName(plant(5, "spark is fast\nthe data is big here"))
      .unionByName(plant(9,
        "lorem ipsum dolor sit amet today.\nthe rest is fine here."))
      .unionByName(plant(13,
        "function f { return the data }\nthe query runs fine today."))
      .unionByName(plant(17,
        "please enable javascript to view this.\n" +
          "the table joins the data well."))
    val isJs = (l: Column) => l.contains("javascript")
    val isShort = (l: Column) => size(split(l, " ")) < 5
    val hasPunct = (l: Column) => l.rlike("[.!?\"]$")
    docs.unionByName(planted)
      .withColumn("lines", split($"text", "\n"))
      .withColumn("n_lines", size($"lines").cast("long"))
      .withColumn("n_js",
        size(filter($"lines", l => isJs(l))).cast("long"))
      .withColumn("n_short", size(filter($"lines",
        l => !isJs(l) && isShort(l))).cast("long"))
      .withColumn("n_nopunct", size(filter($"lines",
        l => !isJs(l) && !isShort(l) && !hasPunct(l))).cast("long"))
      .withColumn("kept", filter($"lines",
        l => !isJs(l) && !isShort(l) && hasPunct(l)))
      .withColumn("n_kept", size($"kept").cast("long"))
      .withColumn("kept_chars",
        coalesce(aggregate($"kept", lit(0L), (acc, l) => acc + length(l)),
          lit(0L)))
      .withColumn("doc_drop",
        $"text".contains("lorem ipsum") || $"text".contains("{"))
      .select($"doc_id", $"n_lines", $"n_js", $"n_short", $"n_nopunct",
        $"n_kept", $"kept_chars", $"doc_drop")
      .orderBy($"doc_id")
  }

  /** CCNet-style LM quality partition (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets"): train a language
    * model on a REFERENCE slice (CCNet uses Wikipedia; here a
    * deterministic 20% md5 slice of the corpus — the PARITY-rule-19
    * stand-in), score every document by cross-entropy under it, and
    * partition the corpus into head/middle/tail by score percentile —
    * the published recipe for "keep the fluent third". The model is
    * the repo's Laplace-smoothed bigram LM (q_llm_bigram_lm), trained
    * on the slice instead of the whole corpus, so OOV mass is real:
    * unseen bigrams back off to (0+1)/(c1+V), unseen unigrams to 1/V.
    *
    * Scale shape: counts shuffle (w1,w2)/(w1) keys, never text; the
    * occurrence side joins ONCE on the flat pair key (c1 pre-joined —
    * the bigram-LM de-skew rule) and only the OOV-pair REMAINDER
    * (small by construction once the reference is representative)
    * takes the second, w1-keyed join for the unigram backoff. The
    * percentile cut is the 100 TB-honest form: thresholds come from a
    * deterministic 5% hash SAMPLE of scores (bounded, one small
    * window — the codebook class), never a global rank over the
    * corpus (the forbidden serial window); every doc then buckets by
    * comparing its ROUNDED score to the two broadcast thresholds, so
    * the cut is exact cross-engine and O(1) per row. */
  def qLlmCcnet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arr = Tables.table(spark, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
    val isRef = Sampling.hashBucket($"doc_id", "ppl", 100) < 20
    val big = arr.filter(size($"toks") >= 2)
      .select($"doc_id", explode(transform(
        sequence(lit(0), size($"toks") - 2),
        i => struct($"toks".getItem(i).as("w1"),
          $"toks".getItem(i + 1).as("w2")))).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val refBig = big.filter(isRef)
    // ONE reference pass builds the model (r14 multi-scan audit: the
    // naive form re-derived the bigram explosion per count — 16 text
    // scans in one plan). c12 is VOCAB-sized — the frame you hold at
    // 100 TB — and c1 is its w1-marginal (Σ_w2 c12 ≡ the direct
    // per-w1 bigram count), so the unigram totals cost a tiny
    // re-aggregation of the checkpoint, not a corpus pass.
    val c12 = refBig.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val v = arr.filter(isRef).select(explode($"toks").as("w"))
      .agg(countDistinct($"w").as("v"))
    val pairs = c12.join(c1, Seq("w1"))
      .select($"w1", $"w2", $"c12", $"c1".as("c1p"))
    val seen = big.join(pairs, Seq("w1", "w2"), "left")
    val matched = seen.filter($"c12".isNotNull)
      .select($"doc_id", $"c12", $"c1p".as("c1"))
    val oov = seen.filter($"c12".isNull)
      .select($"doc_id", $"w1")
      .join(c1, Seq("w1"), "left")
      .select($"doc_id", lit(0L).as("c12"),
        coalesce($"c1", lit(0L)).as("c1"))
    val scored = matched.unionByName(oov)
      .crossJoin(broadcast(v))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(($"c12" + 1).cast("double") / ($"c1" + $"v"))), 4)
          .as("ce"))
      // per-doc scores materialize ONCE (doc_id-sized — holdable):
      // both the threshold sample and the final bucketing read them,
      // and without the checkpoint each re-runs the whole scoring
      // join over the corpus
      .localCheckpoint()
    // thresholds from a deterministic 5% sample: in-sample thirds by
    // (ce, doc_id) rank — a bounded window, broadcast back as scalars
    val sample = scored.filter(Sampling.hashBucket($"doc_id", "cut", 100) < 5)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"ce".asc, $"doc_id".asc)
    val ranked = sample
      .select($"ce", row_number().over(w).as("rk"),
        count(lit(1)).over().as("ns"))
    val cuts = ranked.agg(
      max(when($"rk" * 3 <= $"ns", $"ce")).as("t1"),
      max(when($"rk" * 3 <= $"ns" * 2, $"ce")).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .select($"doc_id", $"n_bigrams", $"ce",
        when($"ce" <= $"t1", "head")
          .when($"ce" <= $"t2", "middle")
          .otherwise("tail").as("bucket"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_gopher" -> (qLlmGopher _),
    "q_llm_c4" -> (qLlmC4 _),
    "q_llm_ccnet" -> (qLlmCcnet _)
  )

  val oracle: Map[String, String] = Map(
    // reference slice, smoothed bigram scoring with the OOV backoff,
    // and the sample-derived tercile cuts all re-derived in SQL; ln
    // parity per q_llm_tfidf, 4dp rounding per q_agg_stats; bucket
    // compares the ROUNDED score so the cut is exact cross-engine
    "q_llm_ccnet" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    (('0x' || substring(md5('ppl:' || doc_id), 1, 7))::BIGINT % 100)
        |      < 20 AS is_ref
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, is_ref, toks[i] AS w1, toks[i+1] AS w2
        |  FROM t, unnest(range(1, len(toks))) AS r(i)
        |  WHERE len(toks) >= 2),
        |c12 AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c12 FROM big
        |  WHERE is_ref GROUP BY w1, w2),
        |c1 AS (
        |  SELECT w1, count(*)::BIGINT AS c1 FROM big
        |  WHERE is_ref GROUP BY w1),
        |v AS (
        |  SELECT count(DISTINCT w)::BIGINT AS v
        |  FROM (SELECT unnest(toks) AS w FROM t WHERE is_ref)),
        |terms AS (
        |  SELECT b.doc_id,
        |    coalesce(p.c12, 0) AS c12,
        |    coalesce(coalesce(p.c1, u.c1), 0) AS c1
        |  FROM big b
        |  LEFT JOIN (SELECT c12.w1, w2, c12, c1 FROM c12
        |             JOIN c1 ON c12.w1 = c1.w1) p
        |    ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN c1 u ON b.w1 = u.w1),
        |scored AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |    round(avg(-ln((c12 + 1)::DOUBLE / (c1 + v))), 4) AS ce
        |  FROM terms, v GROUP BY doc_id),
        |sample AS (
        |  SELECT ce,
        |    row_number() OVER (ORDER BY ce ASC, doc_id ASC) AS rk,
        |    count(*) OVER () AS ns
        |  FROM scored
        |  WHERE (('0x' || substring(md5('cut:' || doc_id), 1, 7))::BIGINT
        |         % 100) < 5),
        |cuts AS (
        |  SELECT max(CASE WHEN rk * 3 <= ns THEN ce END) AS t1,
        |    max(CASE WHEN rk * 3 <= ns * 2 THEN ce END) AS t2
        |  FROM sample)
        |SELECT doc_id, n_bigrams, ce,
        |  CASE WHEN ce <= t1 THEN 'head'
        |       WHEN ce <= t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM scored, cuts ORDER BY doc_id""".stripMargin,
    // every rule compare is cross-multiplied integer arithmetic; the
    // only float is the 2-dp half-up display mean (DIV trick)
    "q_llm_gopher" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |planted AS (
        |  SELECT doc_id + mx + 1 AS doc_id,
        |    'the a ' || trim(repeat('spark # data ... ', 20)) AS text
        |  FROM documents, mx WHERE doc_id < 5
        |  UNION ALL
        |  SELECT doc_id + mx + 6,
        |    'the a ' || trim(repeat('v42 2024 x9 7 ', 15))
        |  FROM documents, mx WHERE doc_id < 5
        |  UNION ALL
        |  SELECT doc_id + mx + 11,
        |    'the a ' || trim(repeat('abcdefghijkl ', 60))
        |  FROM documents, mx WHERE doc_id < 5),
        |alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |m AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS n_words,
        |    (length(text) - (len(string_split(text, ' ')) - 1))::BIGINT
        |      AS sum_len,
        |    len(list_filter(string_split(text, ' '),
        |      t -> contains(t, '#') OR contains(t, '...')))::BIGINT AS n_sym,
        |    len(list_filter(string_split(text, ' '),
        |      t -> regexp_matches(t, '[a-zA-Z]')))::BIGINT AS n_alpha,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a', 'and', 'of', 'to', 'be')))::BIGINT
        |      AS n_stop
        |  FROM alldocs)
        |SELECT doc_id, n_words,
        |  ((200 * sum_len + n_words) // (2 * n_words)) / 100.0 AS mean_wl,
        |  n_sym, n_alpha, n_stop,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        |    AND n_sym * 10 <= n_words
        |    AND n_alpha * 5 >= n_words * 4
        |    AND n_stop >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    // line partition precedence js > short > nopunct > kept keeps the
    // four counts a disjoint cover of n_lines on both engines
    "q_llm_c4" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |planted AS (
        |  SELECT doc_id + mx + 1 AS doc_id,
        |    'the table joins the data well.' || chr(10) || 'short line.'
        |      || chr(10) || 'spark scans run fast and clean.' AS text
        |  FROM documents, mx WHERE doc_id < 4
        |  UNION ALL
        |  SELECT doc_id + mx + 5,
        |    'spark is fast' || chr(10) || 'the data is big here'
        |  FROM documents, mx WHERE doc_id < 4
        |  UNION ALL
        |  SELECT doc_id + mx + 9,
        |    'lorem ipsum dolor sit amet today.' || chr(10)
        |      || 'the rest is fine here.'
        |  FROM documents, mx WHERE doc_id < 4
        |  UNION ALL
        |  SELECT doc_id + mx + 13,
        |    'function f { return the data }' || chr(10)
        |      || 'the query runs fine today.'
        |  FROM documents, mx WHERE doc_id < 4
        |  UNION ALL
        |  SELECT doc_id + mx + 17,
        |    'please enable javascript to view this.' || chr(10)
        |      || 'the table joins the data well.'
        |  FROM documents, mx WHERE doc_id < 4),
        |alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |m AS (
        |  SELECT doc_id, text, string_split(text, chr(10)) AS lines,
        |    list_filter(string_split(text, chr(10)),
        |      l -> NOT contains(l, 'javascript')
        |        AND len(string_split(l, ' ')) >= 5
        |        AND regexp_matches(l, '[.!?"]$')) AS kept
        |  FROM alldocs)
        |SELECT doc_id, len(lines)::BIGINT AS n_lines,
        |  len(list_filter(lines, l -> contains(l, 'javascript')))::BIGINT
        |    AS n_js,
        |  len(list_filter(lines, l -> NOT contains(l, 'javascript')
        |    AND len(string_split(l, ' ')) < 5))::BIGINT AS n_short,
        |  len(list_filter(lines, l -> NOT contains(l, 'javascript')
        |    AND len(string_split(l, ' ')) >= 5
        |    AND NOT regexp_matches(l, '[.!?"]$')))::BIGINT AS n_nopunct,
        |  len(kept)::BIGINT AS n_kept,
        |  coalesce(list_sum(list_transform(kept, l -> length(l))), 0)::BIGINT
        |    AS kept_chars,
        |  (contains(text, 'lorem ipsum') OR contains(text, '{')) AS doc_drop
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
