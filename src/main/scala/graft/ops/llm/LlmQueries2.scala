package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2-K oracled LLM-pipeline queries, part 2 (round 5): PII scrub,
  * deterministic sampling/splitting, int8 quantization,
  * duplicate-cluster assignment, bigram statistics, train/test
  * contamination, portable MinHash, and per-label centroids. Split
  * from [[LlmQueries]] on the Scalars/Scalars2 precedent (keep modules
  * reviewable).
  *
  * Scale notes: pii / sample / quantize are narrow per-row projections
  * (asserted shuffle-free in ScaleSpec); ngrams / minhash / centroid
  * are single-aggregation shapes whose shuffles carry derived pairs or
  * partial aggregates, never raw text; contamination is ONE hash-join
  * keyed by shingle; dedup_cluster is the iterative hash-min component
  * search over a BOUNDED edge list (adjacent-pair candidates here;
  * banded LSH candidates in production — never all-pairs).
  */
object LlmQueries2 {

  /** PII detect + redact over a deterministic in-query fixture: the
    * synthetic corpus carries no digits or '@' (verified), so PII is
    * injected by doc_id arithmetic — every count below is forced by
    * construction, the redaction provably fires, and both engines see
    * the identical text (same fixture pattern as q_cdc_badrecords). */
  def qLlmPii(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val injected = Tables.table(spark, dir, "documents").select(
      $"doc_id",
      concat(
        $"text",
        when(pmod($"doc_id", lit(7)) === 0,
          lit(" contact alice.k+test@data-mail.example.com asap"))
          .otherwise(lit("")),
        when(pmod($"doc_id", lit(11)) === 0,
          lit(" node 10.42.7.199 dialed 555-867-5309 twice"))
          .otherwise(lit(""))).as("text"))
    injected.select(
      $"doc_id",
      PiiRedact.countMatches($"text", PiiRedact.EmailPattern)
        .cast("long").as("n_email"),
      PiiRedact.countMatches($"text", PiiRedact.PhonePattern)
        .cast("long").as("n_phone"),
      PiiRedact.countMatches($"text", PiiRedact.Ipv4Pattern)
        .cast("long").as("n_ip"),
      PiiRedact.redact($"text").as("redacted"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sample + train/val/test split: the
    * data-mixing config is (en 60%, zh 40%, rest 25%), split 80/10/10
    * on an independent salt. Hash-bucketed (md5 prefix), so the same
    * doc keeps its fate across runs and engines — no rand() anywhere. */
  def qLlmSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kept = Sampling.stratifiedSample(
      Tables.table(spark, dir, "documents"),
      "doc_id", "lang", Map("en" -> 60, "zh" -> 40), defaultPct = 25,
      salt = "mix")
    kept.select($"doc_id", $"lang", $"sample_bucket",
      Sampling.assignSplit($"doc_id", 80, 10, "split").as("split"))
      .orderBy($"doc_id")
  }

  /** Symmetric int8 quantization of every embedding: absmax scale,
    * codes via explicit half-up floor (engine-exact), plus an integer
    * L1 checksum of the codes and the max reconstruction error. */
  def qLlmQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "embeddings")
      .withColumn("v", Knn.asDouble($"embedding"))
      .withColumn("scale", Quantize.absmaxScale($"v"))
      .withColumn("codes", Quantize.int8Codes($"v", $"scale"))
      .select(
        $"vec_id",
        round($"scale", 6).as("scale_6dp"),
        array_join(transform($"codes", _.cast("string")), ",").as("codes"),
        aggregate($"codes", lit(0L), (a, c) => a + abs(c)).as("l1_codes"),
        round(Quantize.maxAbsError($"v", $"codes", $"scale"), 6)
          .as("max_err_6dp"))
      .orderBy($"vec_id")
  }

  /** Duplicate-cluster assignment end-to-end: adjacent-pair char-5-gram
    * Jaccard edges at >= 0.22 (integer-DIV jaccard, so the threshold
    * compare is engine-exact), hash-min connected components, then one
    * cluster id per document (singletons = own id). The oracle computes
    * the same clustering in closed form — on a consecutive-id edge set,
    * components are runs, so cluster(d) = the latest doc <= d with no
    * incoming edge ("gaps and islands") — which cross-checks the
    * GENERAL iterative clusterer against an independent formulation. */
  def qLlmDedupCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread the shingle build off the corpus's one input split — it
    // evaluates on the map side of BOTH self-join branches (DocSpread
    // rationale, optimization r20)
    val docs = DocSpread(Tables.table(spark, dir, "documents"))
    val s = NearDup.shingleSets(docs, "doc_id", "text", n = 5)
    val a = s.select($"doc_id".as("doc_a"), $"tokens".as("ta"))
    val b = s.select(($"doc_id" - 1).as("doc_a"), $"doc_id".as("doc_b"),
      $"tokens".as("tb"))
    val edges = a.join(b, "doc_a")
      .withColumn("i_len", size(array_intersect($"ta", $"tb")).cast("long"))
      .withColumn("u_len", size(array_union($"ta", $"tb")).cast("long"))
      .filter(expr("(10000 * i_len) DIV u_len") / 10000.0 >= 0.22)
      .select($"doc_a", $"doc_b")
    DedupCluster.assignClusters(docs.select($"doc_id"), edges,
        "doc_id", "doc_a", "doc_b")
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy($"cluster")))
      .select($"doc_id", $"cluster", $"cluster_size")
      .orderBy($"doc_id")
  }

  /** Boilerplate cleaning over a deterministic in-query fixture (the
    * corpus carries no URLs or markup — verified for the PII fixture):
    * URLs and HTML tags injected by doc_id arithmetic, stripped by the
    * fixed-order clean pass, whitespace renormalized. Counts prove the
    * patterns fired; the cleaned text proves the strip round-trips. */
  def qLlmClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val injected = Tables.table(spark, dir, "documents").select(
      $"doc_id",
      concat(
        when(pmod($"doc_id", lit(9)) === 0,
          lit("<div class=\"ad\"> promo </div> ")).otherwise(lit("")),
        $"text",
        when(pmod($"doc_id", lit(5)) === 0,
          lit(" see https://tracker.example.com/p?id=7&u=2 and " +
            "http://cdn.example.net/x.js <br/>")).otherwise(lit("")))
        .as("text"))
    injected.select(
      $"doc_id",
      TextClean.countMatches($"text", TextClean.UrlPattern)
        .cast("long").as("n_urls"),
      TextClean.countMatches($"text", TextClean.HtmlTagPattern)
        .cast("long").as("n_tags"),
      TextClean.clean($"text").as("cleaned"))
      .orderBy($"doc_id")
  }

  /** Bigram frequency: top-5 two-token sequences per language — the
    * first rung of LM n-gram statistics (and the q_llm_tf shape one
    * level up: the shuffle carries (lang, bigram) pairs, never text). */
  def qLlmNgrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = DocSpread(Tables.table(spark, dir, "documents"))
      .select($"lang", split($"text", " ").as("toks"))
    val bi = toks.filter(size($"toks") >= 2)
      .select($"lang", explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => array_join(slice($"toks", i, lit(2)), " "))).as("bigram"))
    val counts = bi.groupBy($"lang", $"bigram").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"cnt".desc, $"bigram".asc)
    counts.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"lang", $"rk", $"bigram", $"cnt")
      .orderBy($"lang", $"rk")
  }

  /** Train/test contamination audit end-to-end: deterministic split
    * (same salt as q_llm_sample's split stage), 4-token shingles, test
    * docs ranked by distinct shingles shared with ANY train doc.
    * Probed on this corpus: 4 tokens is the discriminative width
    * (2–3 drown in common phrases, 5 finds almost nothing). */
  def qLlmContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = DocSpread(Tables.table(spark, dir, "documents"))
      .withColumn("split", Sampling.assignSplit($"doc_id", 80, 10, "split"))
    Contamination.crossSplitOverlap(docs, "doc_id", "text", "split",
        probeSplit = "test", corpusSplit = "train", n = 4, minHits = 5)
      .orderBy($"doc_id")
  }

  /** Portable MinHash signatures (k=8, md5-prefix salted hashes),
    * oracled bit-for-bit — the cross-engine proof of the MinHash
    * arithmetic the LSH dedup pipeline builds on (the seeded xxhash64
    * production path is scalatest-validated against exact Jaccard).
    * Single-space tokens per the q_llm_tf precedent; the oracle SQL is
    * GENERATED from the same salt loop so the two sides cannot drift. */
  def qLlmMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sets = Tables.table(spark, dir, "documents")
      .select($"doc_id", array_distinct(split($"text", " ")).as("tokens"))
    NearDup.minHashSignaturesPortable(sets, k = 8).orderBy($"doc_id")
  }

  private[llm] def minhashOracle: String = {
    val mins = (0 until 8).map(i =>
      s"min(('0x' || substr(md5('$i:' || t), 1, 7))::BIGINT) AS mh_$i")
      .mkString(",\n  ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |  FROM documents)
       |SELECT doc_id,
       |  $mins
       |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Per-label embedding centroid — the bootstrap primitive of k-means
    * / IVF codebook builds (Knn.ivfCentroids iterates exactly this).
    * Shuffle shape: posexplode → ONE (label, pos) aggregation → one
    * (label) gather; element means round at 4dp (cross-row double sums
    * are order-nondeterministic at the last ulp — same tolerance rule
    * as q_agg_stats). */
  def qLlmCentroid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{DecimalType, StringType}
    val emb = Tables.table(spark, dir, "embeddings")
    val d = emb.withColumn("v", Knn.asDouble($"embedding"))
      .select($"label", posexplode($"v").as(Seq("pos", "x")))
    val cent = d.groupBy($"label", $"pos").agg(avg($"x").as("m"))
      .groupBy($"label")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"pos", $"m"))),
          s => round(s("m"), 4).cast(DecimalType(12, 4)).cast(StringType)),
        ",").as("centroid"))
    emb.groupBy($"label").agg(count(lit(1)).as("n_vecs"))
      .join(cent, "label")
      .orderBy($"label")
  }

  /** Data-mixture report — the per-(lang, source) composition table
    * every pretraining run is configured against: doc counts, token
    * totals, and each cell's share of the corpus. Shape: one
    * (lang, source) groupBy shuffle carrying partial counts; the
    * share division runs over the POST-AGGREGATION frame (≤ |lang| ×
    * |source| rows), so its unpartitioned window is driver-trivial at
    * any corpus size — the window never sees doc-sized data. */
  def qLlmMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = Tables.table(spark, dir, "documents")
      .select($"lang", $"source",
        size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("docs"), sum($"n").as("tokens"))
    val all = Window.partitionBy()
    agg
      .withColumn("token_share",
        round($"tokens" / sum($"tokens").over(all), 4))
      .withColumn("doc_share",
        round($"docs" / sum($"docs").over(all), 4))
      .orderBy($"lang", $"source")
  }

  /** Context-window chunking — the RAG/pretraining chunker: each doc
    * splits into overlapping token windows (32 tokens, stride 24 —
    * sized to the corpus; real pipelines use 512/384, same algebra).
    * Per chunk: index, token count, and an md5 fingerprint of the
    * re-joined window proving the SLICING (boundaries, overlap, short
    * tail) matches cross-engine token-for-token, not just counts.
    * Shape: narrow per-doc explode — the token array is materialized
    * BEFORE the explode (lambda-inlining rule), window starts come
    * from `sequence`, and nothing shuffles until the contract's
    * presentation orderBy. At 100 TB this is a map-only stage. */
  def qLlmChunk(spark: SparkSession, dir: String): DataFrame =
    chunkTokens(Tables.table(spark, dir, "documents"),
      split(col("text"), " "))

  /** The chunker over ANY token source — `toksOf` is the tokenizer
    * mode: `split(text, " ")` is the oracled whitespace default;
    * [[Bpe.tokensCol]] plugs in tokenizer-accurate windows (real
    * pretraining chunks on tokenizer tokens, not words — BpeSpec
    * exercises that mode). Same algebra either way: map-only explode,
    * nothing shuffles before the presentation orderBy. */
  def chunkTokens(docs: DataFrame, toksOf: Column,
                  window: Int = 32, stride: Int = 24): DataFrame = {
    val toks = docs
      .select(col("doc_id"), toksOf.as("t"))
      .filter(size(col("t")) >= 1)
    toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(stride))).as("s"))
      .select(col("doc_id"), expr(s"s DIV $stride").as("chunk_idx"),
        slice(col("t"), col("s") + 1, lit(window)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Sequence packing — deterministic assignment of docs to
    * fixed-token-budget bins (2048 here) in (lang, doc_id) order: the
    * context-window packing step of a pretraining pipeline, with
    * per-bin fill-ratio observability. A doc's bin is where its
    * running token count STARTS — exactly the greedy sequential
    * packer, but expressed as a prefix sum so it distributes.
    *
    * Scale shape — the naive form is a single window partitioned by
    * lang, which serializes EVERY doc of a language into one task (the
    * classic cumsum scale-killer). This implementation is the
    * distributed prefix sum instead: (1) within-BUCKET cumsum, windows
    * partitioned by (lang, doc_id DIV 1024) — thousands of bounded
    * parallel partitions; (2) per-bucket totals cumsum'd in a window
    * over the tiny bucket-summary frame (rows = #buckets, not #docs);
    * (3) broadcast-join the bucket offsets back. Identical result to
    * the serial window, proven by the oracle hash match (DuckDB runs
    * the ONE-window serial form). */
  def qLlmPack(spark: SparkSession, dir: String): DataFrame =
    packTokens(Tables.table(spark, dir, "documents"),
      size(split(col("text"), " ")).cast("long"))

  /** The packer over ANY token-count source — `nOf` is the tokenizer
    * mode: whitespace count is the oracled default; [[Bpe.countCol]]
    * plugs in tokenizer-accurate budgets (BpeSpec exercises that
    * mode). The distributed-prefix-sum shape is identical either way. */
  def packTokens(docs: DataFrame, nOf: Column, budget: Int = 2048): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs
      .select($"doc_id", $"lang", nOf.as("n"),
        expr("doc_id DIV 1024").as("bkt"))
    val inBucket = Window.partitionBy($"lang", $"bkt").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = toks.withColumn("brun", sum($"n").over(inBucket))
    // tiny frame: one row per (lang, bucket) — the serial window runs
    // over THIS, never over the docs
    val offsets = cum.groupBy($"lang", $"bkt")
      .agg(max($"brun").as("btot"))
      .withColumn("off",
        coalesce(sum($"btot").over(
          Window.partitionBy($"lang").orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"lang", $"bkt", $"off")
    cum.join(broadcast(offsets), Seq("lang", "bkt"))
      .select($"lang", expr(s"(off + brun - n) DIV $budget").as("bin"), $"n")
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("docs"), sum($"n").as("tokens"),
        round(sum($"n") / lit(budget.toDouble), 4).as("fill"))
      .orderBy($"lang", $"bin")
  }

  /** Edit-distance (Levenshtein) fuzzy dedup over prefix blocks — the
    * short-string dedup flavor (titles, queries, boilerplate lines)
    * complementing the token/shingle/vector families: pairs of docs
    * whose normalized 40-char titles are within edit distance 3,
    * candidates generated ONLY inside 16-char-prefix blocks (probed:
    * max block 3 at sf0.01, 10 at sf0.1 — the blocked self-join is
    * bounded; a hot boilerplate prefix at 100 TB engages the
    * hot-prefix cap in [[editDistPairsWithStats]], whose default 1000
    * sits far above the probed blocks here, so the oracle compares
    * the uncapped result).
    * Ten twins planted in-query (ids above max(doc_id), the
    * q_llm_cosine_neardup derivation) with one substitution at char
    * 20 — inside the block, distance 1 — so the detector is
    * non-vacuous at any scale. Spark evaluates the THRESHOLDED
    * levenshtein (banded DP, early exit at k=3 — O(k·n) not O(n·m));
    * the returned distance equals DuckDB's unbounded one whenever it
    * survives the filter, which is exactly the rows compared. */
  def qLlmEditDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.table(spark, dir, "documents")
      .select($"doc_id", substring(lower($"text"), 1, 40).as("title"))
      // materialize the 40-char reduction ONCE: the planted-twin union
      // and the blocked self-join reference it through three arms of
      // lineage, which otherwise re-scan documents (and re-read the
      // full text column) 18 times in one plan (r14 multi-scan audit);
      // the checkpoint is ~48 bytes/doc — the frame you can afford to
      // hold at 100 TB, unlike the corpus you cannot afford to re-read
      .localCheckpoint()
    // 1-row aggregate broadcasts; planted ids derived, never hard-coded
    val mx = src.agg(max($"doc_id").as("mx"))
    val planted = src.filter($"doc_id" < 10 && length($"title") >= 40)
      .crossJoin(broadcast(mx))
      .select(($"doc_id" + $"mx" + 1).as("doc_id"),
        concat(substring($"title", 1, 19), lit("~"),
          substring($"title", 21, 20)).as("title"))
    val all = src.unionByName(planted)
    editDistPairsWithStats(all, "doc_id", "title")._1
      .orderBy($"doc_a", $"doc_b")
  }

  /** Production edit-distance near-dup pairs over prefix blocks, with
    * the hot-prefix cap the 100 TB rung demands (the NearDup
    * maxBucketSize treatment): a block of n titles yields n² candidate
    * pairs, so one boilerplate prefix ("click here to accept…") turns
    * the blocked self-join quadratic. Blocks larger than
    * `maxBlockSize` are EXCLUDED from pairing and returned in the
    * second frame as (blk, block_size) — visible, alertable, re-split-
    * able by a longer prefix — never silently truncated. Returns
    * `(pairs, overflowed)`; pairs on surviving blocks are identical to
    * the uncapped run (EditDistCapSpec proves both halves). The
    * overflowed frame is ≤ docs/maxBlockSize rows by construction →
    * broadcast anti-join, no extra sort pass. */
  def editDistPairsWithStats(docs: DataFrame, idCol: String,
                             titleCol: String, k: Int = 3, blockLen: Int = 16,
                             maxBlockSize: Int = 1000)
      : (DataFrame, DataFrame) = {
    val all = docs.select(col(idCol).as("doc_id"), col(titleCol).as("title"))
      .withColumn("blk", substring(col("title"), 1, blockLen))
    val overflowed = all.groupBy(col("blk"))
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)
    val bounded = all.join(broadcast(overflowed.select(col("blk"))),
      Seq("blk"), "left_anti")
    val a = bounded.select(col("blk"), col("doc_id").as("doc_a"),
      col("title").as("ta"))
    val b = bounded.select(col("blk"), col("doc_id").as("doc_b"),
      col("title").as("tb"))
    val pairs = a.join(b, Seq("blk")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), k).cast("long").as("dist"))
      .filter(col("dist") >= 0)
    (pairs, overflowed)
  }

  /** Embedding-cosine near-dup, oracled end-to-end: the corpus has no
    * organic near-duplicate vectors (max label-blocked cosine 0.475 —
    * probed), so 20 perturbed twins (v + 0.05 element-wise, in DOUBLE
    * space so both engines round identically) are planted in-query;
    * at threshold 0.9 the detector must return exactly the planted
    * pairs (min planted sim 0.917 — a 0.44 separation margin, no
    * threshold-edge risk). The seeded hyperplane-LSH variant remains
    * the self-bucketing production path (scalatest). */
  def qLlmCosineNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.table(spark, dir, "embeddings")
      .select($"vec_id", $"label", Knn.asDouble($"embedding").as("embedding"))
      // one embeddings scan (r14 multi-scan audit): max-id, planting
      // and both arms of the bucketed self-join read the materialized
      // double-converted frame
      .localCheckpoint()
    // planted ids sit ABOVE max(vec_id), derived not hard-coded: a fixed
    // +10000 collides with real ids once the table reaches 10k rows
    // (review finding r5) — the 1-row max aggregate broadcasts
    val mx = base.agg(max($"vec_id").as("mx"))
    val planted = base.filter($"vec_id" < 20).crossJoin(broadcast(mx))
      .select(($"vec_id" + $"mx" + 1).as("vec_id"), $"label",
        transform($"embedding", x => x + lit(0.05)).as("embedding"))
    Knn.bucketedNearDups(base.unionByName(planted), "label", 0.9)
      .orderBy($"vec_a")
  }

  /** Count-based bigram LM quality score (the KenLM-shaped filter of a
    * training pipeline, minus the model file): corpus bigram counts →
    * Laplace-smoothed conditional P(w2|w1) = (c12+1)/(c1+V) → per-doc
    * mean log-probability. Low scores flag disfluent/boilerplate text.
    * Shape: bigram build is NARROW (windowed indexing over the
    * materialized token array — never a per-doc shuffle, q_llm_ngrams
    * precedent; the array is its own projection per the lambda-inlining
    * rule); count aggs shuffle (w1,w2)/(w1) pairs, never text; the
    * occurrence-sized side joins ONCE, on the (w1,w2) pair key (c1
    * pre-joins onto the vocabulary-sized c12 — see inline note); V is
    * a broadcast 1-row frame; final per-doc agg is one doc_id shuffle.
    * ln() cross-engine parity is proven by q_llm_tfidf; 4dp rounding
    * absorbs cross-row sum ordering (q_agg_stats tolerance rule).
    * Docs with < 2 tokens have no bigrams and are excluded on both
    * engines (sequence(0, size-2) would go DESCENDING for size 1 —
    * Spark's auto-step — so the filter is correctness, not cosmetics). */
  def qLlmBigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread the tokenize off the corpus's one input split
    // (DocSpread rationale, optimization r20)
    val docs = DocSpread(Tables.table(spark, dir, "documents"))
    val arr = docs.select($"doc_id", split($"text", " ").as("toks"))
    val big = arr.filter(size($"toks") >= 2)
      .select($"doc_id", explode(transform(
        sequence(lit(0), size($"toks") - 2),
        i => struct($"toks".getItem(i).as("w1"),
          $"toks".getItem(i + 1).as("w2")))).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    // ONE bigram pass builds the model: c12 is vocab-sized (the frame
    // you hold at 100 TB) and c1 is its w1-marginal — Σ_w2 c12 is
    // identically the per-w1 bigram count, so the unigram totals cost
    // a re-aggregation of the checkpoint, not a second corpus pass
    // (r14 multi-scan audit)
    val c12 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val v = arr.select(explode($"toks").as("w")).agg(
      countDistinct($"w").as("v"))
    // c1 attaches to the VOCABULARY-sized c12 first: joining the
    // occurrence-sized `big` on w1 alone would concentrate the Zipf
    // head ("the", "of") into hot partitions at 100 TB; on the
    // (w1,w2) pair key the occurrence side joins ONCE, far better
    // spread (pair frequencies are much flatter than unigram's)
    val pairs = c12.join(c1, Seq("w1"))
    big.join(pairs, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(($"c12" + 1).cast("double") / ($"c1" + $"v"))), 4)
          .as("score"))
      .orderBy($"doc_id")
  }

  /** Gopher-style repetition quality signals: fraction of bigram
    * occurrences claimed by the single most frequent bigram, and
    * fraction of trigram occurrences belonging to any repeated
    * trigram — the standard boilerplate/spam filters of a training
    * pipeline (published Gopher/FineWeb heuristics). Ten repetitive
    * docs are PLANTED in-query (ids from max(doc_id)+1, the
    * scale-safe planted-twin pattern) so the `repetitive` flag is
    * exercised on both engines: the real corpus tops out at
    * top2_frac ≈ 0.167 (probed), cleanly under the 0.18 threshold.
    * Shape: gram build is narrow (windowed indexing over the
    * materialized token array, lambda-inlining rule respected);
    * count aggs shuffle (doc, gram) pairs then per-doc rollups —
    * the q_llm_tf cost class; exact integer ratios, round-4. */
  def qLlmRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val mx = docs.agg(max($"doc_id").as("mx"))
    val planted = docs.filter($"doc_id" < 10).crossJoin(broadcast(mx))
      .select(($"doc_id" + $"mx" + 1).as("doc_id"),
        trim(repeat(lit("buy now "), 40)).as("text"))
    // FULLY NARROW per-doc computation (optimization r19, guide §2.4
    // "remove shuffles outright"): both gram statistics are functions
    // of ONE document — top2 = the max multiplicity among its bigrams,
    // dup3 = trigram occurrences whose gram repeats within the doc —
    // so shuffling every gram string through a (doc, len, gram) count
    // exchange plus a per-doc rollup exchange (the previous shape: 2
    // aggregation exchanges carrying ~2N gram strings per doc) bought
    // nothing the row itself doesn't hold. Sort each doc's gram array
    // and run-length-fold it: equal grams are adjacent after
    // array_sort, so the max run IS the max multiplicity and runs ≥ 2
    // sum to the repeated-occurrence count. Per-row O(L log L) work,
    // ZERO gram exchanges (only the output orderBy shuffles — rows,
    // not grams); identical integer counts by construction, same
    // 4dp divisions, oracle untouched. At 100 TB this turns the key's
    // dominant cost (two corpus-sized gram shuffles) into a map pass.
    val arr = docs.unionByName(planted)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    def gramSorted(width: Int) = array_sort(
      transform(sequence(lit(0), size($"t") - width),
        i => concat_ws(" ", (0 until width).map(k =>
          $"t".getItem(i + k)): _*)))
    val runInit = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("acc"))
    // max run length over a sorted gram array (null-safe <=> so the
    // initial null prev never matches a real gram)
    val top2 = aggregate(gramSorted(2), runInit,
      (st, x) => {
        val r = when(x <=> st("prev"), st("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), r.as("run"),
          greatest(st("acc"), r).as("acc"))
      },
      st => st("acc"))
    // total occurrences in runs of length ≥ 2 (a run's length is added
    // when the run CLOSES — on gram change mid-fold, or at finish)
    val dup3 = aggregate(gramSorted(3), runInit,
      (st, x) => {
        val same = x <=> st("prev")
        struct(x.as("prev"),
          when(same, st("run") + 1L).otherwise(lit(1L)).as("run"),
          (st("acc") + when(!same && st("run") >= 2L, st("run"))
            .otherwise(lit(0L))).as("acc"))
      },
      st => st("acc") +
        when(st("run") >= 2L, st("run")).otherwise(lit(0L)))
    arr
      .select($"doc_id",
        (size($"t") - 1).cast("long").as("n2"),
        (size($"t") - 2).cast("long").as("n3"),
        top2.as("top2"), dup3.as("dup3"))
      .select($"doc_id",
        round($"top2".cast("double") / $"n2", 4).as("top2_frac"),
        round($"dup3".cast("double") / $"n3", 4).as("dup3_frac"),
        ($"top2".cast("double") / $"n2" > 0.18 ||
          $"dup3".cast("double") / $"n3" > 0.30).as("repetitive"))
      .orderBy($"doc_id")
  }

  /** Zipf rank-frequency diagnostic per language: slope (and r²) of
    * ln(freq) ~ ln(rank) over the top-100 vocabulary — the standard
    * corpus-health check (natural text ≈ -1; a flat or erratic slope
    * flags templated/synthetic/spam text, which is exactly what this
    * corpus shows). One (lang, token) count shuffle + a top-k window +
    * one tiny per-lang regression agg; regr_slope/regr_r2 exist in
    * both engines with the same (y, x) argument order, ln parity per
    * q_llm_tfidf, 4dp rounding per q_agg_stats. */
  def qLlmZipf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.table(spark, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("token"))
    val cnt = tok.groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"lang").orderBy($"c".desc, $"token".asc)
    cnt.withColumn("rk", row_number().over(w)).filter($"rk" <= 100)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_top"),
        round(regr_slope(log($"c"), log($"rk")), 4).as("zipf_slope"),
        round(regr_r2(log($"c"), log($"rk")), 4).as("fit_r2"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_zipf" -> (qLlmZipf _),
    "q_llm_repetition" -> (qLlmRepetition _),
    "q_llm_bigram_lm" -> (qLlmBigramLm _),
    "q_llm_cosine_neardup" -> (qLlmCosineNeardup _),
    "q_llm_editdist" -> (qLlmEditDist _),
    "q_llm_mix" -> (qLlmMix _),
    "q_llm_chunk" -> (qLlmChunk _),
    "q_llm_pack" -> (qLlmPack _),
    "q_llm_centroid" -> (qLlmCentroid _),
    "q_llm_minhash" -> (qLlmMinhash _),
    "q_llm_clean" -> (qLlmClean _),
    "q_llm_ngrams" -> (qLlmNgrams _),
    "q_llm_contamination" -> (qLlmContamination _),
    "q_llm_pii" -> (qLlmPii _),
    "q_llm_sample" -> (qLlmSample _),
    "q_llm_quantize" -> (qLlmQuantize _),
    "q_llm_dedup_cluster" -> (qLlmDedupCluster _)
  )

  val oracle: Map[String, String] = Map(
    // shares are a single long/long division of identical aggregates
    // (no sum-order variance), so round(.,4) is engine-stable
    "q_llm_mix" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    len(string_split(text, ' '))::BIGINT AS n FROM documents),
        |agg AS (
        |  SELECT lang, source, count(*)::BIGINT AS docs,
        |    sum(n)::BIGINT AS tokens
        |  FROM t GROUP BY lang, source)
        |SELECT lang, source, docs, tokens,
        |  round(tokens / (sum(tokens) OVER ()), 4) AS token_share,
        |  round(docs / (sum(docs) OVER ()), 4) AS doc_share
        |FROM agg ORDER BY lang, source""".stripMargin,
    // the md5 over the re-joined window proves slicing parity
    // token-for-token (boundaries, overlap, short tails)
    "q_llm_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 1),
        |starts AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s FROM toks),
        |chunks AS (
        |  SELECT doc_id, s // 24 AS chunk_idx, t[s + 1 : s + 32] AS c
        |  FROM starts)
        |SELECT doc_id, chunk_idx, len(c)::BIGINT AS n_tokens,
        |  md5(list_aggregate(c, 'string_agg', ' ')) AS chunk_md5
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    // DuckDB runs the SERIAL one-window prefix sum; Spark runs the
    // distributed bucketed form — the hash match proves equivalence
    "q_llm_pack" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS n FROM documents),
        |cum AS (
        |  SELECT doc_id, lang, n,
        |    sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |                 ROWS UNBOUNDED PRECEDING) AS run
        |  FROM toks),
        |bins AS (SELECT lang, ((run - n) // 2048)::BIGINT AS bin, n FROM cum)
        |SELECT lang, bin, count(*)::BIGINT AS docs,
        |  sum(n)::BIGINT AS tokens, round(sum(n) / 2048.0, 4) AS fill
        |FROM bins GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    // DuckDB computes the UNBOUNDED levenshtein then filters <= 3;
    // Spark's thresholded form returns the same distance for every
    // surviving row (and -1 only for rows both engines discard)
    "q_llm_editdist" ->
      """WITH src AS (
        |  SELECT doc_id, substr(lower(text), 1, 40) AS title
        |  FROM documents),
        |mx AS (SELECT max(doc_id) AS m FROM documents),
        |planted AS (
        |  SELECT doc_id + (SELECT m FROM mx) + 1 AS doc_id,
        |    substr(title, 1, 19) || '~' || substr(title, 21, 20) AS title
        |  FROM src WHERE doc_id < 10 AND length(title) >= 40),
        |everything AS (
        |  SELECT doc_id, title, substr(title, 1, 16) AS blk FROM src
        |  UNION ALL
        |  SELECT doc_id, title, substr(title, 1, 16) AS blk FROM planted)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.title, b.title)::BIGINT AS dist
        |FROM everything a JOIN everything b
        |  ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_llm_repetition" ->
      """WITH planted AS (
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    trim(repeat('buy now ', 40)) AS text
        |  FROM documents WHERE doc_id < 10),
        |alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM alldocs
        |  WHERE len(string_split(text, ' ')) >= 3),
        |b2 AS (
        |  SELECT doc_id, len(t) - 1 AS n2,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> t[i + 1] || ' ' || t[i + 2])) AS g
        |  FROM toks),
        |t3 AS (
        |  SELECT doc_id, len(t) - 2 AS n3,
        |    unnest(list_transform(range(len(t) - 2),
        |      i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS g
        |  FROM toks),
        |top2 AS (
        |  SELECT doc_id, any_value(n2) AS n2, max(c) AS top2 FROM (
        |    SELECT doc_id, n2, g, count(*) AS c FROM b2 GROUP BY 1, 2, 3)
        |  GROUP BY doc_id),
        |dup3 AS (
        |  SELECT doc_id, any_value(n3) AS n3,
        |    coalesce(sum(c) FILTER (WHERE c >= 2), 0)::BIGINT AS dup3 FROM (
        |    SELECT doc_id, n3, g, count(*) AS c FROM t3 GROUP BY 1, 2, 3)
        |  GROUP BY doc_id)
        |SELECT top2.doc_id,
        |  round(top2::DOUBLE / n2, 4) AS top2_frac,
        |  round(dup3::DOUBLE / n3, 4) AS dup3_frac,
        |  (top2::DOUBLE / n2 > 0.18 OR dup3::DOUBLE / n3 > 0.30) AS repetitive
        |FROM top2 JOIN dup3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_llm_zipf" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, token, c,
        |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, token ASC) AS rk
        |  FROM cnt QUALIFY rk <= 100)
        |SELECT lang, count(*) AS n_top,
        |  round(regr_slope(ln(c), ln(rk)), 4) AS zipf_slope,
        |  round(regr_r2(ln(c), ln(rk)), 4) AS fit_r2
        |FROM ranked GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q_llm_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
        |  FROM f),
        |big AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v
        |      FROM (SELECT unnest(toks) AS w FROM t))
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(avg(ln((c12.c12 + 1)::DOUBLE / (c1.c1 + v.v))), 4) AS score
        |FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY b.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q_llm_cosine_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |planted AS (
        |  SELECT vec_id + (SELECT max(vec_id) FROM base) + 1 AS vec_id, label,
        |    list_transform(v, x -> x + 0.05) AS v
        |  FROM base WHERE vec_id < 20),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_prepend(0.0,
        |      list_apply(range(1, len(v) + 1), i -> v[i] * v[i])),
        |      (a, x) -> a + x)) AS nrm
        |  FROM u),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_reduce(list_prepend(0.0,
        |      list_apply(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
        |      (acc, x) -> acc + x) / (a.nrm * b.nrm) AS sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE a.nrm > 0 AND b.nrm > 0)
        |SELECT vec_a, vec_b, round(sim, 4) AS sim
        |FROM p WHERE sim >= 0.9
        |ORDER BY vec_a""".stripMargin,
    // v[i] is 1-based in DuckDB, posexplode 0-based in Spark — only the
    // ORDER matters (the pos column is not output), and DECIMAL(12,4)
    // canonicalizes IEEE -0.0 (PARITY rule 13, l2norm precedent)
    "q_llm_centroid" ->
      """WITH e AS (
        |  SELECT label, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT label, i AS pos, v[i] AS x
        |  FROM e CROSS JOIN range(1, 65) t(i)),
        |g AS (SELECT label, pos, avg(x) AS m FROM d GROUP BY label, pos),
        |c AS (
        |  SELECT label,
        |    array_to_string(list(round(m, 4)::DECIMAL(12,4)::VARCHAR ORDER BY pos), ',')
        |      AS centroid
        |  FROM g GROUP BY label)
        |SELECT label, count(*) AS n_vecs, any_value(centroid) AS centroid
        |FROM embeddings JOIN c USING (label)
        |GROUP BY label
        |ORDER BY label""".stripMargin,
    "q_llm_minhash" -> minhashOracle,
    "q_llm_clean" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0
        |      THEN '<div class="ad"> promo </div> ' ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN ' see https://tracker.example.com/p?id=7&u=2 and http://cdn.example.net/x.js <br/>'
        |      ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, 'https?://[^ \t\n\r]+'))::BIGINT AS n_urls,
        |  len(regexp_extract_all(text, '</?[a-zA-Z][^<>]*>'))::BIGINT AS n_tags,
        |  trim(regexp_replace(regexp_replace(regexp_replace(text,
        |    '</?[a-zA-Z][^<>]*>', ' ', 'g'),
        |    'https?://[^ \t\n\r]+', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS cleaned
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_llm_ngrams" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |b AS (
        |  SELECT lang,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> array_to_string(toks[i:i+1], ' '))) AS bigram
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT lang, bigram, count(*) AS cnt FROM b GROUP BY lang, bigram)
        |SELECT lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram ASC) AS rk,
        |  bigram, cnt
        |FROM c
        |QUALIFY rk <= 5
        |ORDER BY lang, rk""".stripMargin,
    // same split arithmetic as q_llm_sample; DuckDB list slice l[i:j]
    // is 1-based inclusive, so toks[i:i+3] is the 4-token window
    "q_llm_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 7))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 7))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, split,
        |    unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+3], ' ')))) AS sh
        |  FROM d WHERE len(toks) >= 4),
        |tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
        |te AS (SELECT DISTINCT doc_id, sh FROM sh WHERE split = 'test')
        |SELECT doc_id, count(*) AS n_hits, count(*) >= 5 AS contaminated
        |FROM te JOIN tr USING (sh)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // same fixture, same patterns, same replace ORDER (email, phone,
    // ip); DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all default
    "q_llm_pii" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text ||
        |      CASE WHEN doc_id % 7 = 0
        |        THEN ' contact alice.k+test@data-mail.example.com asap'
        |        ELSE '' END ||
        |      CASE WHEN doc_id % 11 = 0
        |        THEN ' node 10.42.7.199 dialed 555-867-5309 twice'
        |        ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phone,
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_llm_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 7))::BIGINT % 100
        |      AS sample_bucket,
        |    ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 7))::BIGINT % 100
        |      AS sb
        |  FROM documents)
        |SELECT doc_id, lang, sample_bucket,
        |  CASE WHEN sb < 80 THEN 'train'
        |       WHEN sb < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b
        |WHERE sample_bucket <
        |  CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 40 ELSE 25 END
        |ORDER BY doc_id""".stripMargin,
    "q_llm_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id, v, scale,
        |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE floor(x * 127 / scale + 0.5)::INT END) AS codes
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale_6dp,
        |  array_to_string(list_transform(codes, c -> c::VARCHAR), ',') AS codes,
        |  list_sum(list_transform(codes, c -> abs(c)::BIGINT))::BIGINT AS l1_codes,
        |  round(list_max(list_transform(range(1, len(v) + 1),
        |    i -> abs(v[i] - codes[i] * scale / 127))), 6) AS max_err_6dp
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_llm_dedup_cluster" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(length(t) - 4, 1) + 1),
        |      i -> substr(t, i, 5))) AS toks
        |  FROM (SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
        |        FROM documents)),
        |e AS (
        |  SELECT b.doc_id AS d,
        |    ((10000 * len(list_intersect(a.toks, b.toks))::BIGINT)
        |      // len(list_distinct(list_concat(a.toks, b.toks)))::BIGINT)
        |      / 10000.0 >= 0.22 AS linked
        |  FROM s a JOIN s b ON b.doc_id = a.doc_id + 1),
        |d AS (
        |  SELECT documents.doc_id, coalesce(e.linked, FALSE) AS linked
        |  FROM documents LEFT JOIN e ON e.d = documents.doc_id),
        |-- gaps and islands: on consecutive-id edges a component is a
        |-- run, and its min id is the latest unlinked doc <= d
        |r AS (
        |  SELECT doc_id,
        |    max(CASE WHEN NOT linked THEN doc_id END)
        |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster
        |  FROM d)
        |SELECT doc_id, cluster,
        |  count(*) OVER (PARTITION BY cluster)::BIGINT AS cluster_size
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
