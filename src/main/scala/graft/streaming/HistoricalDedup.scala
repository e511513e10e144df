package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.functions.NormalizeText
import graft.ops.cdc.PartitionedUpsert

/** Streaming exact-dedup of NEW documents against the ACCUMULATED
  * historical corpus — the last rung of the ingest ladder. Every other
  * dedup operator in this library is corpus-at-rest (batch) or
  * within-stream (`dropDuplicatesWithinWatermark`, which bounds state
  * by the lateness horizon and therefore CANNOT answer "did we ingest
  * this document last month?"). Here the state is the corpus itself: a
  * bucket-partitioned, manifest-committed [[PartitionedUpsert]] table
  * keyed by normalized-content hash, holding the canonical copy of
  * every accepted document.
  *
  * Per micro-batch:
  *   1. hash every doc with [[contentHash]] — the SAME
  *      normalize→sha256 expression as the oracled batch exact-dedup
  *      (`q_llm_dedup_exact`), so batch and stream agree on what
  *      "identical" means by construction;
  *   2. first-wins dedup WITHIN the batch (min id per hash);
  *   3. anti-join against the corpus via the path-pruned
  *      [[PartitionedUpsert.readForKeys]] lookup — the history read is
  *      bounded by the BATCH's bucket fan-out (≤ min(|batch hashes|,
  *      nBuckets) buckets), never O(corpus); hash-column pruning means
  *      the parquet scan reads the key column only, not stored text;
  *   4. merge the survivors (hash → id, text, batch lsn) into the
  *      corpus table with txn=(checkpoint, batchId): a micro-batch
  *      replayed after a crash-between-commit-and-checkpoint is
  *      recognized from the manifest and skipped — exactly-once, and a
  *      document can never be accepted twice because the anti-join and
  *      the merge read the same committed snapshot.
  *
  * First-wins is load-bearing: last-write-wins would let a re-crawled
  * copy steal canonical ownership from the historical doc; the
  * anti-join guarantees the FIRST accepted copy keeps its id forever.
  * The deduped corpus is simply `PartitionedUpsert.read(dir)`.
  */
object HistoricalDedup {

  /** Content identity: native single-pass normalize → sha256 — one
    * expression shared by init, ingest, and the oracled batch twin. */
  def contentHash(text: Column): Column =
    sha2(NormalizeText.normalize_native(text), 256)

  /** Bootstrap the corpus table from an existing (batch-prepared)
    * corpus: hash, keep the min-id copy per hash, commit as v1. */
  def initCorpus(docs: DataFrame, dir: String, idCol: String,
                 textCol: String, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    NormalizeText.register(spark)
    val hashed = docs
      .filter(col(textCol).isNotNull)
      .withColumn("content_hash", contentHash(col(textCol)))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol).asc)
    val uniq = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("content_hash"), col(idCol), col(textCol),
        lit(0L).as("ingest_lsn"))
    PartitionedUpsert.init(uniq, dir, "content_hash", nBuckets)
  }

  /** Streaming ingest sink: drop docs whose content already exists in
    * the corpus (or earlier in the same batch), merge the survivors.
    * `droppedCounter` observes the per-batch duplicate count.
    * The streaming `docs` frame must carry `idCol` and `textCol`. */
  def ingestSink(docs: DataFrame, dir: String, checkpointDir: String,
                 idCol: String, textCol: String, nBuckets: Int = 64,
                 droppedCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : StreamingQuery = {
    val spark = docs.sparkSession
    NormalizeText.register(spark)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (PartitionedUpsert.currentManifest(spark, dir).isEmpty) {
          val empty = batch
            .filter(col(textCol).isNotNull)
            .withColumn("content_hash", contentHash(col(textCol)))
            .select(col("content_hash"), col(idCol), col(textCol),
              lit(0L).as("ingest_lsn"))
            .limit(0)
          try PartitionedUpsert.init(empty, dir, "content_hash", nBuckets)
          catch {
            case _: IllegalStateException |
                 _: java.util.ConcurrentModificationException => ()
          }
        }
        val hashed = batch
          .filter(col(textCol).isNotNull)
          .withColumn("content_hash", contentHash(col(textCol)))
          .persist() // read 3×: within-batch dedup, anti-join, dropped count
        try {
          val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol).asc)
          val firsts = hashed.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          // O(batch) history lookup: only the buckets this batch's hashes
          // route to are read, and only their key column (column pruning)
          val existing = PartitionedUpsert
            .readForKeys(spark, dir, firsts.select(col("content_hash")),
              "content_hash")
            .select(col("content_hash"))
          val fresh = firsts.join(existing, Seq("content_hash"), "left_anti")
            .select(col("content_hash"), col(idCol), col(textCol),
              lit(batchId).as("ingest_lsn"), lit("c").as("op"))
          droppedCounter.foreach { acc =>
            val total = hashed.count()
            val kept = fresh.count()
            acc.add(total - kept)
          }
          PartitionedUpsert.merge(spark, dir, fresh, "content_hash",
            "ingest_lsn", "op", Seq(idCol, textCol, "ingest_lsn"), nBuckets,
            txn = Some((checkpointDir, batchId))): Unit
        } finally { hashed.unpersist(); () }
      }
      .start()
  }

  /** Right-to-be-forgotten over the corpus (the erasure feed every
    * training-data pipeline eventually receives): tombstone documents
    * by their normalized-content identity via the O(batch) merge-on-
    * read delete — no bucket rewrites; the stored text stops being
    * readable at THIS commit and the bytes leave disk when the debt
    * retires ([[PartitionedUpsert.purgeTombstones]] / OPTIMIZE on the
    * compaction cadence — run it promptly when erasure is legally
    * clocked). Forgetting RE-OPENS the identity: a later ingest of
    * identical content is accepted as a fresh canonical copy, because
    * the sink's anti-join reads the tombstone-filtered corpus — the
    * content is gone, not remembered-as-deleted (a "remembered"
    * delete would itself retain the forbidden identity). `docs`
    * carries the TEXT; hashing uses the one shared [[contentHash]]
    * expression, so callers never compute identities by hand. */
  def forget(docs: DataFrame, dir: String, textCol: String,
             txn: Option[(String, Long)] = None): Seq[Long] = {
    val spark = docs.sparkSession
    NormalizeText.register(spark)
    PartitionedUpsert.deleteMor(spark, dir,
      docs.filter(col(textCol).isNotNull)
        .select(contentHash(col(textCol)).as("content_hash")),
      "content_hash", txn)
  }

  /** [[forget]] by precomputed content hashes — the shape an erasure
    * LIST (hashes logged at ingest, originals long gone) arrives in. */
  def forgetHashes(hashes: DataFrame, dir: String, hashCol: String,
                   txn: Option[(String, Long)] = None): Seq[Long] =
    PartitionedUpsert.deleteMor(hashes.sparkSession, dir,
      hashes.select(col(hashCol).as("content_hash")), "content_hash", txn)
}
