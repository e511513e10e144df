package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level composition diagnostics: the reports a tokenizer /
  * data-mixture owner reads before committing a training run.
  *
  * Both keys avoid the global-window trap (a single ORDER BY over a
  * corpus-sized frame = one task): vocab coverage pre-filters with
  * per-sub-bucket ranks (q_llm_quota's two-phase shape) before any
  * global rank, and the curriculum derives its phase boundaries from
  * an exact percentile AGGREGATE over a bounded integer score domain
  * (a count-map per partition, merged — never a sort).
  */
object CorpusStats {

  /** Vocabulary coverage curve: what fraction of all token
    * occurrences the top-K vocabulary covers, for K ∈ {10, 100, 1000}
    * — the first sizing input of any tokenizer/vocab decision (Zipf
    * mass concentration, the q_llm_zipf diagnostic integrated).
    *
    * Two-phase top-K: 64 hash sub-buckets rank their own vocabulary
    * slice in parallel and emit local top-1000; the global rank sees
    * ≤ 64·1000 candidate rows. Identical to the one-window form by
    * construction (the global top-K is a subset of every sub-bucket's
    * top-K) — certified by the oracle's QUALIFY evaluation. Coverage
    * is the integer-div 4dp form (PARITY rule 5); counts stay BIGINT
    * end to end. */
  def qLlmVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kMax = 1000
    val counts = Tables.table(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum($"cnt").as("total"))
    val sub = Window.partitionBy(pmod(xxhash64($"token"), lit(64)))
      .orderBy($"cnt".desc, $"token".asc)
    val global = Window.orderBy($"cnt".desc, $"token".asc)
    val ranked = counts
      .withColumn("srk", row_number().over(sub))
      .filter($"srk" <= kMax)
      .withColumn("rk", row_number().over(global))
      .filter($"rk" <= kMax)
    ranked
      .select($"rk", $"cnt",
        explode(array(lit(10), lit(100), lit(1000))).as("top_k"))
      .filter($"rk" <= $"top_k")
      .groupBy($"top_k")
      .agg(sum($"cnt").as("covered"), count(lit(1)).as("n_terms"))
      .crossJoin(broadcast(total))
      .select($"top_k".cast("long").as("top_k"), $"n_terms", $"covered",
        $"total",
        (expr("(10000 * covered) DIV total") / 10000.0).as("coverage_4dp"))
      .orderBy($"top_k")
  }

  /** Curriculum phase assignment: docs split into three difficulty
    * tertiles by stopword density (stop-heavy ≈ natural fluent text
    * first, stop-light ≈ dense/technical text last — the standard
    * easy→hard curriculum heuristic over a quality scalar).
    *
    * Scale-honest tertiles: NOT a global ntile window (one task).
    * The score is the integer-div 4dp stop ratio — a BOUNDED integer
    * domain (0..10000) — so exact `percentile` boundaries aggregate
    * as per-partition count-maps over ≤ 10001 keys and merge; phase
    * assignment is then a broadcast compare. Per-phase stats use
    * exact integer sums with single double divisions (value_idx
    * rule). Boundary docs tie into the LOWER phase on both engines
    * (<=, identical percentile interpolation — the q_agg_stats
    * quantile_cont pairing). */
  def qLlmCurriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a")
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("n_words", size($"toks").cast("long"))
      .withColumn("n_stop",
        size(filter($"toks", t => t.isin(stop: _*))).cast("long"))
      .select($"doc_id", $"lang", $"n_words", $"n_stop",
        expr("(10000 * n_stop) DIV n_words").as("score"))
    val bounds = scored.agg(
      percentile($"score", lit(2.0 / 3)).as("b_hi"),
      percentile($"score", lit(1.0 / 3)).as("b_lo"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("phase",
        when($"score" > $"b_hi", lit(1L))
          .when($"score" > $"b_lo", lit(2L))
          .otherwise(lit(3L)))
      .groupBy($"phase")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("sum_words"),
        sum($"n_stop").as("sum_stop"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("n_en"),
        min($"score").as("min_score"), max($"score").as("max_score"))
      .select($"phase", $"n_docs", $"sum_words", $"n_en",
        $"min_score", $"max_score",
        round($"sum_words".cast("double") / $"n_docs".cast("double"), 4)
          .as("avg_words"),
        (expr("(10000 * sum_stop) DIV sum_words") / 10000.0)
          .as("stop_density_4dp"))
      .orderBy($"phase")
  }

  /** Per-document keyword extraction: the top-3 terms of every doc by
    * TF-IDF (the classic unsupervised tagger — what search indexing,
    * topic routing, and near-dup triage read per doc). Same idf form
    * as q_llm_tfidf; ranking uses the ROUNDED score (6 dp, the
    * q_ts_anomaly flag rule) + token tie so a boundary-straddling raw
    * double can never flip the cut cross-engine.
    *
    * Shape: one (doc, token) tf shuffle; df and N are broadcast
    * frames; the rank window partitions by doc_id — maximal
    * parallelism, no stratum serialization (every partition is one
    * doc's term list). */
  def qLlmKeywords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
    val tokens = docs.select($"doc_id",
      explode(split($"text", " ")).as("token"))
    val tf = tokens.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df_ = tokens.select($"doc_id", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("df_docs"))
    val n = docs.select(count(lit(1)).as("n_total"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tfidf".desc, $"token".asc)
    tf.join(broadcast(df_), "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round($"tf" * log(($"n_total" + 1.0) / ($"df_docs" + 1.0)), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"token", $"tf", $"tfidf")
      .orderBy($"doc_id", $"rk")
  }

  /** Token-budget document cut: the op that EXECUTES a mixture
    * schedule — per stratum (language), take documents in a
    * deterministic content-hash order until the stratum's token
    * budget is met (greedy: a doc is in iff the running total BEFORE
    * it is still under budget — so the set is a prefix of the hash
    * order, reproducible across runs, engines, and scale factors; a
    * stratum whose whole corpus fits under budget is taken whole, the
    * up-sampling case q_llm_mix_schedule flags as epochs > 1).
    *
    * Scale shape (the cumulative-sum trap): a per-stratum running sum
    * ordered by hash is ONE task per stratum if written as a single
    * window — a language is corpus-sized. Two-phase instead, keyed by
    * the FIRST BYTE of the order hash so sub-bucket boundaries align
    * with the global order: (1) each (lang, hash-prefix) slice
    * computes its local prefix sums in parallel (≤ corpus/256 rows
    * per task), (2) per-slice totals (≤ 256·strata rows) get their
    * global offsets in one tiny window, broadcast back, and
    * cum_before = offset + local_before. Identical to the one-window
    * form BY CONSTRUCTION (prefix order = (byte, rest) order) — which
    * is exactly what the oracle's single-window SQL certifies. At
    * 100 TB the slice totals are also the skip index: a slice whose
    * offset already exceeds the budget never needs its rows read
    * (not wired here — the filter after the window is the same rows,
    * but a two-pass variant would push the slice list into the scan).
    * cum_before is part of the OUTPUT so the cross-engine hash proves
    * the whole prefix arithmetic, not just membership. */
  def qLlmTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 5000L // tokens per language stratum
    val toks = Tables.table(spark, dir, "documents").select(
        $"lang", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"),
        md5(concat(lit("budget:"), $"doc_id".cast("string"))).as("h"))
      .withColumn("sub", conv(substring($"h", 1, 2), 16, 10).cast("long"))
    val local = Window.partitionBy($"lang", $"sub")
      .orderBy($"h".asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = toks.withColumn("local_before",
      coalesce(sum($"n_tokens").over(local), lit(0L)))
    val offsets = toks.groupBy($"lang", $"sub")
      .agg(sum($"n_tokens").as("sub_total"))
      .withColumn("offset",
        coalesce(sum($"sub_total").over(
          Window.partitionBy($"lang").orderBy($"sub".asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"lang", $"sub", $"offset")
    withLocal.join(broadcast(offsets), Seq("lang", "sub"))
      .withColumn("cum_before", $"offset" + $"local_before")
      .filter($"cum_before" < budget)
      .select($"lang", $"doc_id", $"n_tokens", $"cum_before")
      .orderBy($"lang", $"cum_before", $"doc_id")
  }

  /** Mixture scheduling: given target language weights (percent) and
    * a total token budget, how many EPOCHS of each language's data the
    * run consumes (epochs = budgeted tokens / available tokens — >1
    * means repetition, the up-sampling an under-represented language
    * pays; the published mixture tables' last column). q_llm_mix
    * reports the ACTUAL composition; this plans the sampled one.
    *
    * Arithmetic: budgeted tokens = (budget·weight) DIV 100 — exact
    * integers; epochs = ONE double division of two exact BIGINTs
    * (value_idx rule), 4 dp. Shape: one (lang) rollup + a broadcast
    * literal target table — scale-free. */
  def qLlmMixSchedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 1000000L // total training tokens to schedule
    val targets = Seq(("en", 40L), ("zh", 20L), ("de", 15L),
      ("fr", 15L), ("es", 10L))
    val avail = Tables.table(spark, dir, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("avail_tokens"),
        count(lit(1)).as("docs"))
    val t = targets.toDF("lang", "weight_pct")
    avail.join(broadcast(t), Seq("lang"))
      .withColumn("budget_tokens",
        expr(s"($budget * weight_pct) DIV 100"))
      .select($"lang", $"weight_pct", $"docs", $"avail_tokens",
        $"budget_tokens",
        round($"budget_tokens".cast("double") /
          $"avail_tokens".cast("double"), 4).as("epochs"),
        ($"budget_tokens" > $"avail_tokens").as("upsampled"))
      .orderBy($"lang")
  }

  /** Cross-source duplication matrix: for every ordered source pair
    * (A, B), how many of A's docs have content (exact sha-class hash)
    * that also appears in B — the corpus-governance readout that
    * decides which crawl to dedup AGAINST which (the published
    * web-corpus reports' overlap tables). Per-doc counts and distinct
    * shared hashes, exact integers.
    *
    * Scale shape: docs reduce to (source, hash) pairs; B's side is
    * DISTINCT (source, hash) BEFORE the join (≪ docs), the join keys
    * on the hash (the q_llm_dedup_exact compaction key — bucketable
    * at 100 TB), and the matrix aggregation is ≤ |sources|² rows. */
  def qLlmCrossdup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.table(spark, dir, "documents")
    // the corpus has NO organic cross-source exact duplicates (probed
    // 0 rows at both SFs) — plant mirror docs so the key is
    // non-vacuous (round-3 rule): every doc_id % 25 == 3 is re-hosted
    // VERBATIM under the next source (ids from max+1 via broadcast
    // scalar — the q_llm_gopher scale-safe pattern, never an
    // unpartitioned window)
    // hash FIRST, then plant: a verbatim mirror has the verbatim
    // hash, so the mirrors derive from the 32-char reduction and the
    // text column is read exactly once (r14 multi-scan audit — the
    // text-carrying union was scanned twice more through the
    // distinct-side self-join)
    val hashed = docs.select($"doc_id", $"source", md5($"text").as("h"))
      .localCheckpoint()
    val mx = hashed.agg(max($"doc_id").as("__max"))
    val mirrors = hashed
      .filter($"doc_id" % 25 === 3)
      .crossJoin(broadcast(mx))
      .select(($"__max" + $"doc_id" + 1).as("doc_id"),
        concat(lit("src"),
          ((regexp_extract($"source", "([0-9]+)", 1).cast("int") + 1) % 20)
            .cast("string")).as("source"),
        $"h")
    val d = hashed.unionByName(mirrors)
    val hs = d.select($"source".as("src_b"), $"h".as("hb")).distinct()
    d.join(hs, $"h" === $"hb" && $"source" =!= $"src_b")
      .groupBy($"source".as("src_a"), $"src_b")
      .agg(count(lit(1)).as("dup_docs"),
        countDistinct($"h").as("dup_hashes"))
      .orderBy($"src_a", $"src_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_crossdup" -> (qLlmCrossdup _),
    "q_llm_vocab_coverage" -> (qLlmVocabCoverage _),
    "q_llm_curriculum" -> (qLlmCurriculum _),
    "q_llm_keywords" -> (qLlmKeywords _),
    "q_llm_mix_schedule" -> (qLlmMixSchedule _),
    "q_llm_token_budget" -> (qLlmTokenBudget _)
  )

  val oracle: Map[String, String] = Map(
    // the one-window form the two-phase decomposition must equal
    "q_llm_token_budget" ->
      """WITH tok AS (
        |  SELECT lang, doc_id,
        |         len(string_split(text, ' '))::BIGINT AS n_tokens,
        |         md5('budget:' || doc_id::VARCHAR) AS h
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, n_tokens,
        |    (CAST(sum(n_tokens) OVER (PARTITION BY lang
        |       ORDER BY h ASC, doc_id ASC
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens)
        |      AS cum_before
        |  FROM tok)
        |SELECT lang, doc_id, n_tokens, cum_before
        |FROM c WHERE cum_before < 5000
        |ORDER BY lang, cum_before, doc_id""".stripMargin,
    // exact integer counts; distinct (source, hash) before the join
    "q_llm_crossdup" ->
      """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
        |mirrors AS (
        |  SELECT mx.m + doc_id + 1 AS doc_id,
        |    concat('src',
        |      ((regexp_extract(source, '([0-9]+)', 1)::INT + 1) % 20)::VARCHAR)
        |      AS source,
        |    text
        |  FROM documents, mx WHERE doc_id % 25 = 3),
        |alldocs AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id, source, text FROM mirrors),
        |d AS (
        |  SELECT doc_id, source, md5(text) AS h FROM alldocs),
        |hs AS (SELECT DISTINCT source AS src_b, h FROM d)
        |SELECT d.source AS src_a, hs.src_b,
        |  count(*) AS dup_docs,
        |  count(DISTINCT d.h) AS dup_hashes
        |FROM d JOIN hs ON d.h = hs.h AND d.source <> hs.src_b
        |GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // same literal targets; epochs = one division of exact BIGINTs
    "q_llm_mix_schedule" ->
      """WITH avail AS (
        |  SELECT lang, sum(len(string_split(text, ' ')))::BIGINT
        |    AS avail_tokens, count(*) AS docs
        |  FROM documents GROUP BY lang),
        |t(lang, weight_pct) AS (
        |  VALUES ('en', 40), ('zh', 20), ('de', 15), ('fr', 15), ('es', 10))
        |SELECT a.lang, t.weight_pct::BIGINT AS weight_pct, a.docs,
        |  a.avail_tokens,
        |  (1000000 * t.weight_pct) // 100 AS budget_tokens,
        |  round(((1000000 * t.weight_pct) // 100)::DOUBLE
        |    / a.avail_tokens::DOUBLE, 4) AS epochs,
        |  ((1000000 * t.weight_pct) // 100 > a.avail_tokens) AS upsampled
        |FROM avail a JOIN t USING (lang)
        |ORDER BY lang""".stripMargin,
    // same idf arithmetic as q_llm_tfidf; rank on the ROUNDED score
    "q_llm_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM tok GROUP BY doc_id, token),
        |df AS (
        |  SELECT token, count(*) AS df_docs
        |  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
        |n AS (SELECT count(*) AS n_total FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |    round(tf.tf * ln((n.n_total + 1.0) / (df.df_docs + 1.0)), 6)
        |      AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id,
        |  row_number() OVER (PARTITION BY doc_id
        |                     ORDER BY tfidf DESC, token ASC) AS rk,
        |  token, tf, tfidf
        |FROM scored
        |QUALIFY rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    // the ONE-window evaluation — certifies the two-phase pre-filter
    "q_llm_vocab_coverage" ->
      """WITH c AS (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token, count(*) AS cnt FROM c GROUP BY token),
        |ranked AS (
        |  SELECT token, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk
        |  FROM counts QUALIFY rk <= 1000),
        |total AS (SELECT sum(cnt)::BIGINT AS total FROM counts),
        |ks AS (SELECT unnest([10, 100, 1000]) AS top_k)
        |SELECT top_k::BIGINT AS top_k,
        |  count(*) AS n_terms,
        |  sum(cnt)::BIGINT AS covered,
        |  (SELECT total FROM total) AS total,
        |  ((10000 * sum(cnt)::BIGINT) // (SELECT total FROM total)) / 10000.0
        |    AS coverage_4dp
        |FROM ranked, ks
        |WHERE rk <= top_k
        |GROUP BY top_k ORDER BY top_k""".stripMargin,
    // same integer score, same percentile boundaries (quantile_cont
    // interpolation matches Spark's percentile — q_agg_stats pairing)
    "q_llm_curriculum" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS n_words,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a')))::BIGINT AS n_stop
        |  FROM documents),
        |s2 AS (
        |  SELECT *, (10000 * n_stop) // n_words AS score FROM scored),
        |b AS (
        |  SELECT quantile_cont(score, 2.0/3) AS b_hi,
        |    quantile_cont(score, 1.0/3) AS b_lo
        |  FROM s2),
        |p AS (
        |  SELECT s2.*,
        |    CASE WHEN score > (SELECT b_hi FROM b) THEN 1
        |         WHEN score > (SELECT b_lo FROM b) THEN 2
        |         ELSE 3 END::BIGINT AS phase
        |  FROM s2)
        |SELECT phase, count(*) AS n_docs,
        |  sum(n_words)::BIGINT AS sum_words,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
        |  min(score) AS min_score, max(score) AS max_score,
        |  round(sum(n_words)::DOUBLE / count(*)::DOUBLE, 4) AS avg_words,
        |  ((10000 * sum(n_stop)::BIGINT) // sum(n_words)::BIGINT) / 10000.0
        |    AS stop_density_4dp
        |FROM p GROUP BY phase ORDER BY phase""".stripMargin
  )
}
