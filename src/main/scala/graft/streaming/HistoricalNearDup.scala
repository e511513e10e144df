package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.ops.cdc.PartitionedUpsert
import graft.ops.llm.NearDup

/** Streaming NEAR-duplicate dedup against the accumulated historical
  * corpus — the fuzzy sibling of [[HistoricalDedup]]: "is this doc a
  * ≥-threshold Jaccard match of ANYTHING we ever accepted?", answered
  * per micro-batch with history reads bounded by the batch, not the
  * corpus.
  *
  * State = two manifest-committed tables:
  *  - signature table (key = doc id): tokens + MinHash signature of
  *    every ACCEPTED doc — what verification joins against;
  *  - band index (key = "band:bandhash"): the member doc ids of every
  *    LSH band bucket, capped at `maxBucketMembers` with an
  *    `overflowed` flag (the bounded-bucket lesson from batch LSH:
  *    one boilerplate mega-bucket must not make a batch quadratic —
  *    recall loss is FLAGGED, never silent).
  *
  * Per micro-batch:
  *  1. tokenize + sign the batch ([[NearDup.minHashSignatures]], and
  *     [[NearDup.bandKeys]] — the SAME banding encoding as the batch
  *     LSH path, so stream and batch can never hash a band apart);
  *  2. drop within-batch near-dups (verified pairs, greedy keep-min);
  *  3. point-look-up the batch's band keys in the band index
  *     ([[PartitionedUpsert.readForKeys]] — ≤ |batch|×bands buckets),
  *     explode the members, fetch ONLY those docs' signatures/tokens
  *     (a second pruned point lookup), verify exact token Jaccard;
  *  4. merge survivors into the signature table, then fold their band
  *     keys into the band index (read-modify-write of exactly the
  *     rows step 3 already fetched; single-writer streaming makes the
  *     RMW safe, the manifest conflict detector catches anything else).
  *
  * Exactly-once: both merges carry txn=(checkpoint#table, batchId).
  * A crash between the two merges leaves the band index one batch
  * stale — the REPLAY completes it (each merge skips or applies by
  * its own txn) before any later batch reads, so no accepted doc is
  * ever invisible to candidates beyond the crashed batch itself.
  *
  * Recall contract: banded-LSH recall (1-(1-J^r)^b), minus members
  * dropped by overflowed buckets — same trade, same visibility, as
  * the batch [[NearDup.lshCandidatesWithStats]] cap.
  */
object HistoricalNearDup {

  final case class Config(k: Int = 32, bands: Int = 8,
                          threshold: Double = 0.8,
                          maxBucketMembers: Int = 64) {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    def rowsPerBand: Int = k / bands
  }

  /** doc_id, tokens, mh_* signature columns, for one frame. */
  private def signed(docs: DataFrame, idCol: String, textCol: String,
                     cfg: Config): DataFrame = {
    val sets = NearDup.tokenSets(
      docs.filter(col(textCol).isNotNull), idCol, textCol)
    NearDup.minHashSignatures(sets, cfg.k).join(sets, "doc_id")
  }

  /** (doc_id, bkey) — band keys as the band index's string key. */
  private def docBandKeys(sig: DataFrame, cfg: Config): DataFrame =
    NearDup.bandKeys(sig, cfg.bands, cfg.rowsPerBand)
      .select(col("doc_id"),
        concat(col("band"), lit(":"), col("bh")).as("bkey"))

  /** Band-index rows for a set of accepted docs: members sorted,
    * capped, overflow flagged. `prior` (bkey, members, overflowed)
    * folds in the existing rows. private[streaming] so the cap/flag
    * arithmetic is directly testable. */
  private[streaming] def bandRows(newKeys: DataFrame, prior: DataFrame,
                                  cfg: Config): DataFrame =
    newKeys.groupBy(col("bkey"))
      .agg(collect_list(col("doc_id")).as("new_members"))
      .join(prior, Seq("bkey"), "left")
      // existing members are NEVER evicted: an accepted doc that was
      // indexed in this band must stay discoverable through it. Only
      // NEW ids are capped, to the remaining capacity (smallest first,
      // for determinism — collect_list order isn't stable). array_except
      // also makes replay idempotent: re-offered ids fold to no-op.
      .withColumn("existing",
        coalesce(col("members"), array().cast("array<long>")))
      .withColumn("fresh",
        array_sort(array_except(col("new_members"), col("existing"))))
      .withColumn("capacity",
        greatest(lit(cfg.maxBucketMembers) - size(col("existing")), lit(0)))
      .select(col("bkey"),
        concat(col("existing"),
          slice(col("fresh"), lit(1), col("capacity"))).as("members"),
        (coalesce(col("overflowed"), lit(false)) ||
          size(col("fresh")) > col("capacity")).as("overflowed"))

  /** Index an existing (already-deduped) corpus: signature table +
    * band index, committed as v1 of each. */
  def initCorpus(docs: DataFrame, sigDir: String, bandDir: String,
                 idCol: String, textCol: String, cfg: Config = Config(),
                 nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    val sig = signed(docs, idCol, textCol, cfg).persist()
    try {
      PartitionedUpsert.init(sigTableRows(sig, cfg), sigDir, "doc_id", nBuckets)
      val empty = emptyBandFrame(spark)
      PartitionedUpsert.init(bandRows(docBandKeys(sig, cfg), empty, cfg),
        bandDir, "bkey", nBuckets)
    } finally { sig.unpersist(); () }
  }

  private def sigTableRows(sig: DataFrame, cfg: Config): DataFrame =
    sig.select(col("doc_id"), col("tokens"),
      array((0 until cfg.k).map(i => col(s"mh_$i")): _*).as("sig"))

  private def emptyBandFrame(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("bkey", StringType),
        StructField("members", ArrayType(LongType)),
        StructField("overflowed", BooleanType))))
  }

  /** Streaming ingest: drop near-dups of history (and of earlier docs
    * in the same batch), index the survivors. `droppedCounter`
    * observes per-batch drops. */
  def ingestSink(docs: DataFrame, sigDir: String, bandDir: String,
                 checkpointDir: String, idCol: String, textCol: String,
                 cfg: Config = Config(), nBuckets: Int = 64,
                 droppedCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // each table's init is guarded INDEPENDENTLY: a crash between
        // the two inits must not leave bandDir permanently
        // uninitialized behind an initialized sigDir (the restart
        // would otherwise skip the whole block and wedge on reads)
        val e = signed(batch, idCol, textCol, cfg).limit(0)
        if (PartitionedUpsert.currentManifest(spark, sigDir).isEmpty)
          try PartitionedUpsert.init(sigTableRows(e, cfg), sigDir, "doc_id",
            nBuckets)
          catch {
            case _: IllegalStateException |
                 _: java.util.ConcurrentModificationException => ()
          }
        if (PartitionedUpsert.currentManifest(spark, bandDir).isEmpty)
          try PartitionedUpsert.init(
            bandRows(docBandKeys(e, cfg), emptyBandFrame(spark), cfg),
            bandDir, "bkey", nBuckets)
          catch {
            case _: IllegalStateException |
                 _: java.util.ConcurrentModificationException => ()
          }
        // every frame persisted in this batch is released in the ONE
        // finally below — a merge failure (conflict, IO) must not leak
        // cached blocks across the retries Structured Streaming runs
        val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
        val sig = signed(batch, idCol, textCol, cfg).persist()
        persisted += sig
        try {
          // 2: within-batch near-dups — verified pairs, greedy keep-min
          // (doc_a < doc_b by construction, so dropping every doc_b
          // keeps each pair's smaller id)
          val innerDrops = NearDup.exactJaccard(
              NearDup.lshCandidates(sig, cfg.bands, cfg.rowsPerBand), sig)
            .filter(col("jaccard") >= cfg.threshold)
            .select(col("doc_b").as("doc_id")).distinct()
          val kept = sig.join(innerDrops, Seq("doc_id"), "left_anti")
          // 3: historical candidates — two pruned point lookups
          val keys = docBandKeys(kept, cfg).persist()
          persisted += keys
          val priorBands = PartitionedUpsert
            .readForKeys(spark, bandDir, keys.select(col("bkey")), "bkey")
            .persist() // reused for the read-modify-write in step 4
          persisted += priorBands
          val candidateIds = keys
            .join(priorBands, "bkey")
            .select(col("doc_id"), explode(col("members")).as("cand_id"))
            .distinct()
          val candSigs = PartitionedUpsert
            .readForKeys(spark, sigDir,
              candidateIds.select(col("cand_id").as("doc_id")), "doc_id")
          val histDrops = candidateIds
            .join(kept.select(col("doc_id"), col("tokens").as("ta")), "doc_id")
            .join(candSigs.select(col("doc_id").as("cand_id"),
              col("tokens").as("tb")), "cand_id")
            .withColumn("jaccard",
              size(array_intersect(col("ta"), col("tb"))).cast("double") /
                size(array_union(col("ta"), col("tb"))))
            .filter(col("jaccard") >= cfg.threshold)
            .select(col("doc_id")).distinct()
          val survivors = kept.join(histDrops, Seq("doc_id"), "left_anti")
            .persist()
          persisted += survivors
          droppedCounter.foreach { acc =>
            acc.add(sig.count() - survivors.count())
          }
          // 4: index the survivors — signatures first, then the band
          // index (see class doc for the crash-between-merges contract)
          PartitionedUpsert.merge(spark, sigDir,
            sigTableRows(survivors, cfg)
              .withColumn("lsn", lit(batchId)).withColumn("op", lit("c")),
            "doc_id", "lsn", "op", Seq("tokens", "sig"), nBuckets,
            txn = Some((s"$checkpointDir#sig", batchId)))
          val newBand = bandRows(docBandKeys(survivors, cfg),
            priorBands, cfg)
            .withColumn("lsn", lit(batchId)).withColumn("op", lit("c"))
          PartitionedUpsert.merge(spark, bandDir, newBand,
            "bkey", "lsn", "op", Seq("members", "overflowed"), nBuckets,
            txn = Some((s"$checkpointDir#band", batchId))): Unit
        } finally { persisted.foreach(_.unpersist()); () }
      }
      .start()
  }
}
