package graft.ops.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-master LWW-register table: the TABLE-BACKED twin of
  * q_cdc_merge_multi. Writers on several sites emit (key, ts, prio,
  * lsn, site, deleted, values…); the stored state keeps, per key, the
  * single winner under the total order (ts, prio, lsn) — last-writer-
  * wins, site priority breaks clock ties, lsn breaks same-site ties.
  * Because the order is total and the resolution is an argmax, applies
  * are COMMUTATIVE, ASSOCIATIVE and IDEMPOTENT across batches: any
  * delivery order from any site converges to the same state (the
  * classic LWW-register CRDT, materialized).
  *
  * The piece the oracled query cannot show: resolution against STORED
  * state. An out-of-order arrival (an old site-a write delivered after
  * a newer site-b write was already applied) must lose against the
  * table, not just within its own batch — so each batch is resolved in
  * three bounded steps:
  *   1. within-batch winner per key (struct-max argmax — two-phase
  *      aggregate, map-side combined),
  *   2. a BUCKET-PRUNED read of the stored ord for exactly the batch's
  *      keys (O(touched buckets), never O(table) — the
  *      HistoricalDedup read-bound argument),
  *   3. drop incoming rows at-or-below the stored ord, then
  *      [[PartitionedUpsert.merge]] the true winners (txn-guarded, so
  *      a replayed micro-batch is a metadata no-op).
  *
  * Deletes are TOMBSTONES, not physical removals: a deleted row keeps
  * its (ts, prio, lsn) so an older concurrent write cannot resurrect
  * the key — the standard LWW-set rule. [[read]] filters them;
  * [[reapTombstones]] reclaims them under an EXPLICIT cross-site
  * stability horizon (the usual CRDT GC bound — the caller asserts
  * every site has delivered all writes below it; the spec constructs
  * the resurrection hazard a premature reap opens).
  *
  * Single writer per target (the repo-wide sink contract): concurrent
  * foreign merges fail loudly on the manifest CAS, never corrupt.
  */
object LwwMerge {

  /** Ord/metadata columns every LWW batch must carry. */
  val ordCols: Seq[String] = Seq("ts", "prio", "lsn", "site", "deleted")

  /** Resolve one multi-site batch against the stored state and merge
    * the true winners. `batch` columns: keyCol ++ ordCols ++
    * valueCols. Returns the touched bucket ids (empty = no-op). */
  def resolveAndMerge(spark: SparkSession, dir: String, batch: DataFrame,
                      keyCol: String, valueCols: Seq[String], nBuckets: Int,
                      txn: Option[(String, Long)] = None): Seq[Long] = {
    val stateCols = ordCols ++ valueCols
    if (PartitionedUpsert.currentManifest(spark, dir).isEmpty) {
      val empty = batch.select((keyCol +: stateCols).map(col): _*).limit(0)
      try PartitionedUpsert.init(empty, dir, keyCol, nBuckets)
      catch { // racing initializer: the table exists either way
        case _: IllegalStateException |
             _: java.util.ConcurrentModificationException => ()
      }
    }
    val m = PartitionedUpsert.currentManifest(spark, dir).get
    // 1. within-batch winner per key: field order IS the total order
    val winners = batch
      .groupBy(col(keyCol))
      .agg(max(struct(stateCols.map(col): _*)).as("__w"))
      .select(col(keyCol) +: stateCols.map(c => col(s"__w.$c").as(c)): _*)
    // 2. stored ord for exactly the batch's keys (bucket-pruned read)
    val buckets = winners
      .select(PartitionedUpsert.routeFor(m, col(keyCol)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // bounded: ≤ nBuckets
    val stored = PartitionedUpsert.readBuckets(spark, dir, m, buckets)
      .select(col(keyCol),
        struct(col("ts"), col("prio"), col("lsn")).as("__stored_ord"))
    // 3. true winners only: new keys, or strictly newer than stored
    val survivors = winners
      .join(stored, Seq(keyCol), "left")
      .filter(col("__stored_ord").isNull ||
        struct(col("ts"), col("prio"), col("lsn")) > col("__stored_ord"))
      .drop("__stored_ord")
      .withColumn("__op", lit("u")) // tombstones are writes, never 'd'
    PartitionedUpsert.merge(spark, dir, survivors, keyCol, "lsn", "__op",
      stateCols, nBuckets, txn = txn)
  }

  /** Live rows (tombstones filtered). */
  def read(spark: SparkSession, dir: String): DataFrame =
    PartitionedUpsert.read(spark, dir).filter(!col("deleted"))

  /** Reclaim tombstones older than `stableBefore` — the CRDT GC pass,
    * with its safety precondition EXPLICIT instead of implied: the
    * caller asserts that every site has delivered all writes with
    * ts < stableBefore (a cross-site stability horizon — in practice
    * min over sites of their acked low-watermark). Under that
    * assertion no write older than a reaped tombstone can ever arrive,
    * so removal is safe; without it, a late pre-horizon write would
    * RESURRECT the key (the spec constructs exactly this hazard).
    * Physical removal reuses the merge machinery: reaped keys become
    * op='d' rows at their stored lsn (the stored row is the latest,
    * so compact keeps it and the delete applies). Returns the number
    * of tombstones reaped. */
  def reapTombstones(spark: SparkSession, dir: String,
                     stableBefore: java.sql.Timestamp,
                     nBuckets: Int): Long = {
    val dead = PartitionedUpsert.read(spark, dir)
      .filter(col("deleted") && col("ts") < lit(stableBefore))
      .withColumn("__op", lit("d"))
    val n = dead.count()
    if (n > 0) {
      val m = PartitionedUpsert.currentManifest(spark, dir).get
      PartitionedUpsert.merge(spark, dir, dead, m.keyCol, "lsn", "__op",
        ordCols ++ m.schema.fieldNames.filterNot(
          c => c == m.keyCol || ordCols.contains(c)).toSeq, nBuckets): Unit
    }
    n
  }

  /** Every stored register including tombstones (audit/GC view). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    PartitionedUpsert.read(spark, dir)
}
