package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pipeline — every stage
  * is one of this package's operators, composed in the order a
  * production ingest runs them:
  *
  *  1. PII redaction ([[PiiRedact]] — narrow projection)
  *  2. quality filter ([[LlmQueries.qLlmQuality]]'s banding rules —
  *     narrow projection; short/boilerplate docs dropped)
  *  2.5. (opt-in) span-level repeated-text removal ([[Boilerplate.
  *     stripRepeatedSpans]] — corpus-repeated n-gram spans excised
  *     from the text, fully-template docs dropped)
  *  2.6. (opt-in) benchmark decontamination ([[Boilerplate.
  *     stripContaminatedSpans]] — spans covered by any benchmark
  *     n-gram excised; pure-leakage docs dropped)
  *  3. exact dedup (native-normalize sha256, keep min id per hash —
  *     one shuffle; ALWAYS before near-dup so identical-text clusters
  *     never reach LSH banding, the mega-bucket lesson in BASELINE.md)
  *  4. near-dup clustering (MinHash+LSH candidates → verified Jaccard
  *     edges → hash-min components — bucket-bounded, never all-pairs)
  *     keeping the min doc id of every cluster
  *  4.5. (opt-in) semantic dedup ([[SemDedup]] — embedding-cluster
  *     cosine twins collapse to the centroid-farthest member; the
  *     paraphrase rung token-based dedup cannot reach)
  *  5. deterministic stratified sampling + train/val/test split
  *     ([[Sampling]] — narrow projections, reproducible by hash)
  *
  * Order matters for cost, not just semantics: the narrow filters run
  * first so the shuffling stages see the smallest corpus, and exact
  * dedup halves near-dup's candidate volume before LSH.
  *
  * Deterministic end to end: same input → same corpus, on every run
  * and at every scale (nothing samples by `rand()`, every hash is
  * seeded/content-based).
  */
object CorpusPipeline {

  final case class Config(
      stopwords: Seq[String] = Seq("the", "a"),
      minWords: Int = 20,
      nearDupThreshold: Double = 0.8,
      minHashK: Int = 32,
      minHashBands: Int = 8,
      sampleRatesPct: Map[String, Int] = Map.empty,
      defaultSamplePct: Int = 100,
      trainPct: Int = 80,
      valPct: Int = 10,
      // span-level repeated-text removal (stage 2.5): excise spans
      // repeated VERBATIM across >= stripMinDocs docs before dedup —
      // opt-in (it rewrites text; some corpora want scoring only)
      stripSpans: Boolean = false,
      stripNGram: Int = 8,
      stripMinDocs: Int = 2,
      // semantic dedup (stage 4.5): SemDeDup over an embedding column
      // the caller's docs carry — opt-in via a trained coarse codebook
      // (paraphrases share no tokens, so the MinHash stage cannot see
      // them; this one can)
      semDedupCentroids: Option[Array[Array[Double]]] = None,
      semDedupThreshold: Double = 0.95,
      embCol: String = "embedding",
      // benchmark decontamination (stage 2.6): excise spans covered by
      // any benchmark n-gram ([[Boilerplate.stripContaminatedSpans]])
      // — opt-in via the benchmark frame; runs AFTER the repeated-span
      // strip on the same cleaned text, before dedup
      decontamBench: Option[DataFrame] = None,
      decontamBenchTextCol: String = "text",
      decontamNGram: Int = 8)

  /** Returns the prepared corpus: surviving rows of `docs` with
    * `redacted` (scrubbed text), `cluster` (near-dup cluster id — its
    * own id for uniques), and `split` ∈ train/val/test. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              stratumCol: String, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.NormalizeText.register(spark)

    // 1-2: scrub then band on the scrubbed text; only 'ok' survives —
    // the band comes from the SAME rules the oracled quality query
    // uses (TextAnalysis.qualityBand), so the pipeline cannot drift
    // from the cross-engine-verified definition
    val scrubbed = docs
      // a NULL text is unusable in every later stage — drop it
      // EXPLICITLY rather than relying on SQL null propagation
      // (qualityBand's otherwise("ok") would wave a NULL through)
      .filter(col(textCol).isNotNull)
      .withColumn("redacted", PiiRedact.redact(col(textCol)))
      .withColumn("__toks", split(col("redacted"), " "))
      .withColumn("__n_words", size(col("__toks")).cast("long"))
      .withColumn("__n_stop", size(filter(col("__toks"),
        t => t.isin(cfg.stopwords: _*))).cast("long"))
      .filter(TextAnalysis.qualityBand(col("__n_words"), col("__n_stop"),
        cfg.minWords) === "ok")
      .drop("__toks", "__n_words", "__n_stop")

    // 2.5 (opt-in): excise corpus-repeated spans from the surviving
    // text BEFORE dedup — the published recipe removes the span, not
    // the doc; stripping templates first also makes exact dedup see
    // through per-doc unique framing around shared boilerplate. A doc
    // stripped to nothing is dropped (it was all template).
    val cleaned =
      if (!cfg.stripSpans) scrubbed
      else Boilerplate.stripRepeatedSpans(scrubbed, idCol, "redacted",
          cfg.stripNGram, cfg.stripMinDocs)
        .withColumn("redacted", col("stripped"))
        .drop("stripped", "n_tokens", "n_removed")
        .filter(length(col("redacted")) > 0)

    // 2.6 (opt-in): benchmark decontamination — spans covered by any
    // benchmark n-gram excise from the training text (eval answers
    // must never survive into the corpus); a doc stripped to nothing
    // was pure leakage and drops
    val decontaminated = cfg.decontamBench match {
      case None => cleaned
      case Some(bench) =>
        Boilerplate.stripContaminatedSpans(cleaned, idCol, "redacted",
            bench, cfg.decontamBenchTextCol, cfg.decontamNGram)
          .withColumn("redacted", col("stripped"))
          .drop("stripped", "n_tokens", "n_removed")
          .filter(length(col("redacted")) > 0)
    }

    // 3: exact dedup on normalized content (min id wins — stable)
    val hashed = decontaminated.withColumn("__h", sha2(
      graft.functions.NormalizeText.normalize_native(col("redacted")), 256))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol).asc)
    val uniq = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__h")

    // 4: near-dup edges (banded candidates, verified Jaccard) →
    // components → keep each cluster's min id
    val edges = NearDup.minHashNearDups(uniq, idCol, "redacted",
      cfg.minHashK, cfg.minHashBands, cfg.nearDupThreshold)
    val clustered = DedupCluster.assignClusters(uniq, edges, idCol,
      "doc_a", "doc_b")
      .filter(col("cluster") === col(idCol))

    // 4.5 (opt-in): semantic dedup over the caller's embedding column
    // — within-centroid cosine twins collapse to the most-diverse
    // (centroid-farthest) member; zero-norm embeddings drop (no
    // defined similarity)
    val semantic = cfg.semDedupCentroids match {
      case None => clustered
      case Some(cents) => SemDedup.semDedup(clustered, idCol, cfg.embCol,
        cents, cfg.semDedupThreshold)
    }

    // 5: deterministic mixing + split
    Sampling.stratifiedSample(semantic, idCol, stratumCol,
        cfg.sampleRatesPct, cfg.defaultSamplePct)
      .withColumn("split",
        Sampling.assignSplit(col(idCol), cfg.trainPct, cfg.valPct))
      .drop("sample_bucket")
  }

  /** Write the prepared corpus as token-budgeted SHARDS — the actual
    * deliverable of a training-data pipeline (a trainer consumes
    * numbered shards of roughly equal token count, not one giant
    * table). Shard assignment reuses [[LlmQueries2.packTokens]]'s
    * distributed prefix sum (per-stratum running token position DIV
    * budget — no serial window ever sees the docs), so a doc lands in
    * the shard its starting position falls in: every shard's total is
    * within one document of the budget, deterministically, at any
    * parallelism. One FILE per shard: repartitionByRange on the shard
    * key keeps equal keys in one task (so each `stratum=.../shard=...`
    * dir receives exactly one part file), and the dirs are the
    * Hive-partitioned layout every reader lists.
    *
    * Returns the per-shard manifest (stratum, shard, docs, tokens) the
    * same data was written under; committed LAST as
    * `_manifest/done.tsv` via the atomic no-overwrite publish, so a
    * reader that sees the manifest sees finished data (the
    * PartitionedUpsert commit-ordering rule). */
  def writeShards(docs: DataFrame, outDir: String, idCol: String,
                  textCol: String, stratumCol: String,
                  tokensPerShard: Int = 1 << 20): DataFrame = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val n = size(split(col(textCol), " ")).cast("long")
    val toks = docs.select(col("*"), n.as("__n"),
      expr(s"$idCol DIV 1024").as("__bkt"))
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), $"__bkt").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = toks.withColumn("__brun", sum($"__n").over(inBucket))
    val offsets = cum.groupBy(col(stratumCol), $"__bkt")
      .agg(max($"__brun").as("__btot"))
      .withColumn("__off", coalesce(sum($"__btot").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(stratumCol)).orderBy($"__bkt")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            -1)), lit(0L)))
      .select(col(stratumCol), $"__bkt", $"__off")
    val sharded = cum.join(broadcast(offsets), Seq(stratumCol, "__bkt"))
      .withColumn("shard",
        expr(s"(__off + __brun - __n) DIV $tokensPerShard"))
    sharded
      .withColumnRenamed(stratumCol, "stratum")
      .drop("__bkt", "__brun", "__off")
      .repartitionByRange(col("stratum"), col("shard"))
      .write.mode("overwrite").partitionBy("stratum", "shard")
      .parquet(s"$outDir/data")
    val manifest = sharded.groupBy(col(stratumCol).as("stratum"), $"shard")
      .agg(count(lit(1)).as("docs"), sum($"__n").as("tokens"))
      .orderBy($"stratum", $"shard")
    val rows = manifest.collect() // one row per shard — bounded
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.cdc.AtomicPublish.publishNoOverwrite(fs,
      new org.apache.hadoop.fs.Path(s"$outDir/_manifest/done.tsv"),
      rows.map(r => s"${r.get(0)}\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getLong(3)}")
        .mkString("\n"))
    manifest
  }
}
