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
    * excluded on both engines.
    *
    * Plan-form audit (round-13, after the r12 bench flagged
    * 0.54→0.89 s with this file untouched): measured warm at sf0.1
    * with a task-metrics spill listener, the window form runs
    * 0.50–0.61 s with ZERO memory/disk spill and beats both
    * alternatives — groupBy+join-back 1.20 s (the gram explode
    * evaluates twice: column pruning splits the exchange), checkpoint
    * + semi-join 0.92 s. The r12 number was bench-context noise, not
    * a plan change or spill; bench_results.json now records a
    * normalized plan fingerprint per key so this class of mystery is
    * attributable by elimination. */
  def qLlmBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread the 8-gram shingle build off the corpus's one input
    // split (DocSpread rationale, optimization r20)
    val docs = DocSpread(Tables.table(spark, dir, "documents"))
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

  /** Span-level repeated-text REMOVAL — the published
    * dedup-training-data recipe excises the repeated span, not the
    * document ([[qLlmBoilerplate]] only *scores* contamination; a
    * pipeline user wants the surviving text). A token is removed iff
    * it is covered by at least one occurrence of an n-gram that
    * appears in ≥ `minDocs` DISTINCT documents; the cleaned text is
    * the space-rejoin of the survivors — maximal repeated runs come
    * out whole, unique prefix/suffix text stays.
    *
    * Returns `docs` plus `stripped` (cleaned text), `n_tokens`,
    * `n_removed`. Scale shape = the boilerplate miner's: gram build is
    * narrow windowed indexing over the materialized token array, the
    * distinct/count and the occurrence join-back both shuffle the
    * vocabulary-sized gram key (one row per (doc, gram) — never per
    * occurrence pair), and the final excision is a per-doc array
    * filter — no cross-doc pairs, linear where pairwise dedup is
    * quadratic. (The contamination-style xxhash64 gram transport is
    * the 100 TB upgrade for the join key; kept as strings here because
    * a collision would wrongly mark a gram shared — not
    * threshold-absorbed — and for oracle comparability.)
    */
  def stripRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minDocs: Int = 2): DataFrame = {
    import docs.sparkSession.implicits._
    require(n >= 2 && minDocs >= 2, "n-gram size and doc threshold must be >= 2")
    val toks = docs.select(col(idCol).as("__id"), split(col(textCol), " ").as("__t"))
    val grams = toks.filter(size($"__t") >= n)
      .select($"__id", explode(transform(sequence(lit(0), size($"__t") - n),
        i => struct(i.as("i"), concat_ws(" ",
          (0 until n).map(k => $"__t".getItem(i + k)): _*).as("g")))).as("og"))
      .select($"__id", $"og.i".as("i"), $"og.g".as("g"))
    val shared = grams.select($"__id", $"g").distinct()
      .groupBy($"g").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= minDocs).select($"g")
    val covered = grams.join(shared, Seq("g"), "left_semi")
      .groupBy($"__id").agg(collect_list($"i").as("__ss"))
      .withColumnRenamed("__id", idCol)
    docs.join(covered, Seq(idCol), "left")
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("__ss", coalesce($"__ss", array().cast("array<int>")))
      .withColumn("__cov",
        array_distinct(flatten(transform($"__ss", s => sequence(s, s + n - 1)))))
      .withColumn("__kept", filter($"__t", (_, j) => !array_contains($"__cov", j)))
      .withColumn("n_tokens", size($"__t").cast("long"))
      .withColumn("n_removed", (size($"__t") - size($"__kept")).cast("long"))
      .withColumn("stripped", concat_ws(" ", $"__kept"))
      .drop("__t", "__ss", "__cov", "__kept")
  }

  /** Benchmark DECONTAMINATION at span level — the eval-integrity
    * twin of [[stripRepeatedSpans]]: a training token is removed iff
    * it is covered by an n-gram that occurs ANYWHERE in the benchmark
    * set (the published decontamination recipes drop or excise
    * n-gram-overlapping spans so eval answers never leak into
    * training text; q_llm_contamination only *reports* the overlap).
    * Same linear shape: the benchmark gram set is (bench-sized)
    * vocabulary keyed, the join-back is per (doc, gram), the excision
    * a per-doc array filter — no train×bench pairs ever materialize.
    */
  def stripContaminatedSpans(docs: DataFrame, idCol: String, textCol: String,
                             bench: DataFrame, benchTextCol: String,
                             n: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    require(n >= 2, "n-gram size must be >= 2")
    val toks = docs.select(col(idCol).as("__id"), split(col(textCol), " ").as("__t"))
    val grams = toks.filter(size($"__t") >= n)
      .select($"__id", explode(transform(sequence(lit(0), size($"__t") - n),
        i => struct(i.as("i"), concat_ws(" ",
          (0 until n).map(k => $"__t".getItem(i + k)): _*).as("g")))).as("og"))
      .select($"__id", $"og.i".as("i"), $"og.g".as("g"))
    val bt = bench.select(split(col(benchTextCol), " ").as("__t"))
    val benchGrams = bt.filter(size($"__t") >= n)
      .select(explode(transform(sequence(lit(0), size($"__t") - n),
        i => concat_ws(" ",
          (0 until n).map(k => $"__t".getItem(i + k)): _*))).as("g"))
      .distinct()
    val covered = grams.join(benchGrams, Seq("g"), "left_semi")
      .groupBy($"__id").agg(collect_list($"i").as("__ss"))
      .withColumnRenamed("__id", idCol)
    docs.join(covered, Seq(idCol), "left")
      .withColumn("__t", split(col(textCol), " "))
      .withColumn("__ss", coalesce($"__ss", array().cast("array<int>")))
      .withColumn("__cov",
        array_distinct(flatten(transform($"__ss", s => sequence(s, s + n - 1)))))
      .withColumn("__kept", filter($"__t", (_, j) => !array_contains($"__cov", j)))
      .withColumn("n_tokens", size($"__t").cast("long"))
      .withColumn("n_removed", (size($"__t") - size($"__kept")).cast("long"))
      .withColumn("stripped", concat_ws(" ", $"__kept"))
      .drop("__t", "__ss", "__cov", "__kept")
  }

  /** Oracled decontamination: the benchmark is a deterministic
    * hash-slice of the corpus (md5 bucket < 5 of 100 — the
    * q_llm_sample rule) plus one planted eval doc whose 12-token
    * answer span is embedded mid-text in ten planted training docs
    * (unique prefix/suffix around it — the strip fixture shape).
    * Exactly the embedded span excises from the planted trainers;
    * organic train docs sharing an 8-gram with the benchmark slice
    * excise too (real leakage, agreed cross-engine). */
  def qLlmDecontamStrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs0 = Tables.table(spark, dir, "documents").select($"doc_id", $"text")
    val mx = docs0.agg(max($"doc_id").as("mx"))
    val bucket = Sampling.hashBucket($"doc_id", "decontam", 100)
    val benchOrganic = docs0.filter(bucket < 5)
    val answer = (0 until 12).map(k => s"ans$k").mkString(" ")
    val benchPlanted = Seq((-1L, s"evalq $answer evala")).toDF("doc_id", "text")
    val train = docs0.filter(bucket >= 5)
    val trainPlanted = docs0.filter($"doc_id" < 10).crossJoin(broadcast(mx))
      .select(($"doc_id" + $"mx" + 1).as("doc_id"),
        concat_ws(" ",
          concat(lit("px"), $"doc_id"), concat(lit("py"), $"doc_id"),
          lit(answer),
          concat(lit("sx"), $"doc_id"), concat(lit("sy"), $"doc_id")).as("text"))
    stripContaminatedSpans(
      train.unionByName(trainPlanted), "doc_id", "text",
      benchOrganic.unionByName(benchPlanted), "text")
      .select($"doc_id", $"n_tokens", $"n_removed",
        length($"stripped").cast("long").as("cleaned_chars"),
        md5($"stripped").as("cleaned_md5"))
      .orderBy($"doc_id")
  }

  /** Oracled strip over documents ∪ ten planted template docs (unique
    * 2-token prefix/suffix around a 12-token shared template, ids above
    * max(doc_id) — the scale-safe planted pattern): the template's
    * 8-grams repeat across the ten, so exactly the 12 middle tokens
    * excise and the 4 unique ones survive — PARTIAL removal proven by
    * the md5 over the cleaned text. Planted tokens carry digits; the
    * organic corpus is lowercase-alpha (probed), so no accidental
    * cross-contamination. */
  def qLlmBoilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs0 = Tables.table(spark, dir, "documents").select($"doc_id", $"text")
    val mx = docs0.agg(max($"doc_id").as("mx"))
    val tmpl = (0 until 12).map(k => s"tmpl$k").mkString(" ")
    val planted = docs0.filter($"doc_id" < 10).crossJoin(broadcast(mx))
      .select(($"doc_id" + $"mx" + 1).as("doc_id"),
        concat_ws(" ",
          concat(lit("px"), $"doc_id"), concat(lit("py"), $"doc_id"),
          lit(tmpl),
          concat(lit("sx"), $"doc_id"), concat(lit("sy"), $"doc_id")).as("text"))
    stripRepeatedSpans(docs0.unionByName(planted), "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_removed",
        length($"stripped").cast("long").as("cleaned_chars"),
        md5($"stripped").as("cleaned_md5"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_boilerplate" -> (qLlmBoilerplate _),
    "q_llm_boilerplate_strip" -> (qLlmBoilerplateStrip _),
    "q_llm_decontam_strip" -> (qLlmDecontamStrip _)
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
        |ORDER BY d.doc_id""".stripMargin,
    // same md5-bucket benchmark slice + planted eval/train docs; the
    // shared set is the BENCH gram set (decontamination), everything
    // else the boilerplate_strip 1-based twin
    "q_llm_decontam_strip" ->
      """WITH bucket AS (
        |  SELECT doc_id, text,
        |    ('0x' || substring(md5('decontam:' || doc_id), 1, 7))::BIGINT % 100
        |      AS b
        |  FROM documents),
        |bench AS (
        |  SELECT doc_id, text FROM bucket WHERE b < 5
        |  UNION ALL
        |  SELECT -1 AS doc_id,
        |    'evalq ans0 ans1 ans2 ans3 ans4 ans5 ans6 ans7 ans8 ans9 ans10 ans11 evala'
        |      AS text),
        |train AS (
        |  SELECT doc_id, text FROM bucket WHERE b >= 5
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    'px' || doc_id || ' py' || doc_id ||
        |    ' ans0 ans1 ans2 ans3 ans4 ans5 ans6 ans7 ans8 ans9 ans10 ans11 ' ||
        |    'sx' || doc_id || ' sy' || doc_id AS text
        |  FROM documents WHERE doc_id < 10),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM train),
        |grams AS (
        |  SELECT doc_id, i, list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        |  FROM toks, unnest(range(1, len(t) - 6)) AS r(i)
        |  WHERE len(t) >= 8),
        |btoks AS (SELECT string_split(text, ' ') AS t FROM bench),
        |bgrams AS (
        |  SELECT DISTINCT list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        |  FROM btoks, unnest(range(1, len(t) - 6)) AS r(i)
        |  WHERE len(t) >= 8),
        |cov AS (
        |  SELECT doc_id, list_distinct(flatten(list(range(i, i + 8)))) AS covered
        |  FROM grams JOIN bgrams USING (g) GROUP BY doc_id),
        |kept AS (
        |  SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
        |    list_transform(list_filter(range(1, len(t.t) + 1),
        |      j -> NOT list_contains(coalesce(c.covered, []::BIGINT[]), j)),
        |      j -> t.t[j]) AS kt
        |  FROM toks t LEFT JOIN cov c USING (doc_id))
        |SELECT doc_id, n_tokens,
        |  (n_tokens - len(kt))::BIGINT AS n_removed,
        |  length(coalesce(list_aggregate(kt, 'string_agg', ' '), ''))::BIGINT
        |    AS cleaned_chars,
        |  md5(coalesce(list_aggregate(kt, 'string_agg', ' '), '')) AS cleaned_md5
        |FROM kept ORDER BY doc_id""".stripMargin,
    // 1-based twin of the Spark 0-based strip: range() is
    // end-exclusive, so start i covers t[i..i+7] via range(i, i+8);
    // string_agg over an empty kept list is NULL → coalesce '' (md5('')
    // is the canonical empty digest on both engines, probed)
    "q_llm_boilerplate_strip" ->
      """WITH planted AS (
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    'px' || doc_id || ' py' || doc_id ||
        |    ' tmpl0 tmpl1 tmpl2 tmpl3 tmpl4 tmpl5 tmpl6 tmpl7 tmpl8 tmpl9 tmpl10 tmpl11 ' ||
        |    'sx' || doc_id || ' sy' || doc_id AS text
        |  FROM documents WHERE doc_id < 10),
        |all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM all_docs),
        |grams AS (
        |  SELECT doc_id, i, list_aggregate(t[i:i+7], 'string_agg', ' ') AS g
        |  FROM toks, unnest(range(1, len(t) - 6)) AS r(i)
        |  WHERE len(t) >= 8),
        |shared AS (
        |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams) GROUP BY g
        |  HAVING count(*) >= 2),
        |cov AS (
        |  SELECT doc_id, list_distinct(flatten(list(range(i, i + 8)))) AS covered
        |  FROM grams JOIN shared USING (g) GROUP BY doc_id),
        |kept AS (
        |  SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
        |    list_transform(list_filter(range(1, len(t.t) + 1),
        |      j -> NOT list_contains(coalesce(c.covered, []::BIGINT[]), j)),
        |      j -> t.t[j]) AS kt
        |  FROM toks t LEFT JOIN cov c USING (doc_id))
        |SELECT doc_id, n_tokens,
        |  (n_tokens - len(kt))::BIGINT AS n_removed,
        |  length(coalesce(list_aggregate(kt, 'string_agg', ' '), ''))::BIGINT
        |    AS cleaned_chars,
        |  md5(coalesce(list_aggregate(kt, 'string_agg', ' '), '')) AS cleaned_md5
        |FROM kept ORDER BY doc_id""".stripMargin
  )
}
