package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection (§2-K): MinHash+LSH, SimHash, and exact
  * Jaccard (the small-n verifier). Not oracle-checked (seeded hash
  * algorithms are engine-specific) — validated in NearDupSpec against
  * exhaustive exact Jaccard on the small corpus.
  *
  * Scale shape (the whole point of these): candidate generation is
  * groupBy/join on *bucket keys* — never an all-pairs cross join. At
  * 100 TB: tokenize → one shuffle to build signatures (k min-aggs in a
  * single pass) → explode to (band, bandHash) → self-join on bucket →
  * verify candidates only. Expected candidate volume is tuned by
  * (bands × rowsPerBand) per the standard S-curve; skewed buckets
  * (boilerplate docs) are handled by AQE skew-join or a bucket-size
  * cap.
  */
object NearDup {

  /** doc_id + distinct-token set (sorted for determinism). */
  def tokenSets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      array_sort(array_distinct(split(col(textCol), graft.Ws.Plus))).as("tokens"))

  /** MinHash signatures: k seeded xxhash64 min-aggregates in ONE pass
    * over the exploded tokens (single shuffle on doc_id). */
  def minHashSignatures(sets: DataFrame, k: Int): DataFrame = {
    val tok = sets.select(col("doc_id"), explode(col("tokens")).as("t"))
    val mins = (0 until k).map(i => min(xxhash64(col("t"), lit(i))).as(s"mh_$i"))
    tok.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Engine-portable MinHash signatures: the same k-min-aggs-in-one-
    * pass shape as [[minHashSignatures]], but the salted token hash is
    * an md5 prefix (`md5("<i>:" + token)`, 28 bits) instead of
    * Spark-seeded xxhash64 — md5 is bit-identical everywhere, so the
    * signatures are DuckDB-oracle-able (q_llm_minhash cross-checks the
    * MinHash arithmetic itself across engines). The xxhash64 variant
    * stays the production fast path. */
  def minHashSignaturesPortable(sets: DataFrame, k: Int): DataFrame = {
    val tok = sets.select(col("doc_id"), explode(col("tokens")).as("t"))
    val mins = (0 until k).map(i =>
      min(conv(substring(md5(concat(lit(s"$i:"), col("t"))), 1, 7), 16, 10)
        .cast("long")).as(s"mh_$i"))
    tok.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band of the signature.
    * bands × rowsPerBand must equal the signature length.
    *
    * maxBucketSize caps the per-bucket pair blow-up: a bucket of n
    * docs yields n² candidate pairs, so one mega-cluster (boilerplate
    * or replicated text) turns the whole job quadratic — observed
    * empirically in ScaleSmoke before the cap existed. Oversized
    * buckets are dropped here; run exact dedup (identical-hash) FIRST
    * so exact-duplicate clusters never reach MinHash, then oversized
    * buckets are genuinely rare and are better handled by refining
    * their shingles than by pairing them. */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int,
                    maxBucketSize: Int = 1000): DataFrame =
    lshCandidatesWithStats(sig, bands, rowsPerBand, maxBucketSize)._1

  /** (doc_id, band, bh) band-bucket keys of a signature frame — the
    * ONE banding encoding shared by batch candidate generation and the
    * historical (stream-vs-corpus) band index, so the two can never
    * hash a band differently. */
  def bandKeys(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val sigLen = sig.columns.count(_.startsWith("mh_"))
    require(bands * rowsPerBand == sigLen,
      s"bands($bands) x rowsPerBand($rowsPerBand) must equal signature length ($sigLen)")
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** [[lshCandidates]] plus the buckets the cap dropped, as
    * `(candidates, dropped)` where dropped = (band, bh, bucket_size).
    * The cap trades recall for boundedness; this makes the trade
    * visible — a caller can count/log the dropped set, alert on it, or
    * re-run its docs through finer shingles. The dropped frame is lazy
    * and ≤ (docs×bands)/maxBucketSize rows by construction. */
  def lshCandidatesWithStats(sig: DataFrame, bands: Int, rowsPerBand: Int,
                             maxBucketSize: Int = 1000): (DataFrame, DataFrame) = {
    val exploded = bandKeys(sig, bands, rowsPerBand)
    // the oversized-bucket list is tiny by construction → broadcast
    // anti-join beats a per-bucket window count (no extra sort pass)
    val dropped = exploded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucketSize)
    val bounded = exploded.join(
      broadcast(dropped.select(col("band"), col("bh"))),
      Seq("band", "bh"), "left_anti")
    val a = bounded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = bounded.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    (candidates, dropped)
  }

  /** Exact Jaccard for given candidate pairs (verification stage). */
  def exactJaccard(pairs: DataFrame, sets: DataFrame): DataFrame = {
    val sa = sets.select(col("doc_id").as("doc_a"), col("tokens").as("ta"))
    val sb = sets.select(col("doc_id").as("doc_b"), col("tokens").as("tb"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash near-dup pipeline: LSH candidates verified at threshold. */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val sets = tokenSets(docs, idCol, textCol)
    val cand = lshCandidates(minHashSignatures(sets, k), bands, k / bands)
    exactJaccard(cand, sets).filter(col("jaccard") >= threshold)
  }

  /** All-pairs exact Jaccard — O(n²) reference for tests only. */
  def allPairsJaccard(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sets = tokenSets(docs, idCol, textCol)
    val a = sets.select(col("doc_id").as("doc_a"), col("tokens").as("ta"))
    val b = sets.select(col("doc_id").as("doc_b"), col("tokens").as("tb"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Character n-gram shingles (rolling window) — the shingle→Jaccard
    * path for languages without spaces. Normalization (lower,
    * whitespace-collapse) is the caller's job: see [[shingleSets]].
    *
    * PERF: `textCol` is referenced from inside the `transform` lambda,
    * so whatever expression it is gets RE-EVALUATED once per shingle
    * (Catalyst inlines the column tree; there is no common-subexpr
    * rescue inside a lambda). Pass a column that is already
    * materialized in its own projection — [[shingleSets]] does — or a
    * 300-char doc pays ~300 regex evaluations instead of one (measured
    * 6.4× on the sf0.1 corpus). */
  def charShingles(textCol: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(textCol) - (n - 1), lit(1))),
      i => substr(textCol, i, lit(n))))

  /** doc_id + distinct char-n-gram set (the shingle twin of tokenSets).
    * Uses the single-pass native kernel
    * ([[graft.functions.CharShingles]], bit-identical to the HOF
    * reference — CharShinglesSpec); the shingle set is deliberately
    * NOT sorted — every consumer takes sizes, min-hashes, or
    * set-intersections, and distinct-first-occurrence order is already
    * deterministic. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = {
    graft.functions.CharShingles.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
      graft.functions.CharShingles.shingles_native(col(textCol), n)
        .as("tokens"))
  }

  /** n-gram Jaccard near-dup: the MinHash+LSH pipeline over char
    * shingles instead of word tokens. Catches edits INSIDE words and
    * works without word boundaries (CJK, concatenated text) — a
    * one-character change shifts only n of the shingles, where
    * word-token Jaccard between two single-token docs is 0 or 1.
    * Same cost shape as minHashNearDups: one shuffle to sign, banded
    * buckets, candidates-only verification. */
  def shingleNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val sets = shingleSets(docs, idCol, textCol, n)
    val cand = lshCandidates(minHashSignatures(sets, k), bands, k / bands)
    exactJaccard(cand, sets).filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ----

  /** 64-bit SimHash fingerprint per doc: per-bit majority vote over
    * token hashes, computed as 64 conditional sums in one aggregation
    * pass (single shuffle on doc_id). */
  def simHash(sets: DataFrame): DataFrame = {
    val tok = sets.select(col("doc_id"), explode(col("tokens")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s_$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"s_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Engine-portable SimHash: same per-bit majority vote as [[simHash]]
    * but the token hash is the first 8 md5 hex chars (32 bits) instead
    * of Spark-seeded xxhash64 — md5 is bit-identical everywhere, so
    * this variant is DuckDB-oracle-able (q_llm_simhash). A tied bit
    * (sum 0) votes 0 on both engines. 32 bits is plenty for banding;
    * the xxhash64 64-bit variant stays the production fast path. */
  def simHashPortable(sets: DataFrame, nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 32, s"nBits=$nBits must be in [1,32]")
    val tok = sets.select(col("doc_id"), explode(col("tokens")).as("t"))
      .withColumn("hv", conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until nBits).map(b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$b"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until nBits).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dups: bucket by 16-bit bands (a pair within hamming
    * distance 3 shares at least one of the 4 bands — pigeonhole), then
    * verify the distance. */
  def simHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDistance: Int = 3): DataFrame = {
    val fp = simHash(tokenSets(docs, idCol, textCol))
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("bh"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"),
        col("bb.bh").as("bh"))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_a"), col("simhash").as("fa"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_b"), col("simhash").as("fb"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming(col("fa"), col("fb")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }
}
