package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** Streaming exact-dedup against the accumulated historical corpus:
  * a document already ingested in ANY earlier batch (or the initial
  * batch-prepared corpus) is dropped, the first accepted copy keeps
  * canonical ownership forever, restarts are exactly-once, and the
  * history lookup is bounded by the batch, not the corpus. */
class HistoricalDedupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docLine(id: Long, text: String) =
    s"""{"doc_id":$id,"text":"$text"}"""

  private def corpusState(dir: String): Map[Long, String] =
    PartitionedUpsert.read(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

  test("a doc already in the corpus arriving in a later micro-batch is " +
      "dropped; within-batch dups keep the min id") {
    val base = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    import spark.implicits._
    // historical corpus: docs 1, 2
    HistoricalDedup.initCorpus(
      Seq((1L, "alpha text one"), (2L, "beta text two")).toDF("doc_id", "text"),
      s"$base/corpus", "doc_id", "text", nBuckets = 8)
    // batch 1: new doc 10; doc 11 = normalize-dup of historical doc 1;
    // doc 12 = within-batch dup of doc 10
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(docLine(10, "gamma text three"),
        docLine(11, "Alpha  TEXT one"),
        docLine(12, "gamma text three")).mkString("\n"))
    // batch 2: doc 20 = dup of batch-1's doc 10 (NOW historical); doc 21 new
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(docLine(20, "gamma  text   three"),
        docLine(21, "delta text four")).mkString("\n"))
    val dropped = spark.sparkContext.longAccumulator("dropped")
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(srcDir)
    val q = HistoricalDedup.ingestSink(stream, s"$base/corpus",
      s"$base/ckpt", "doc_id", "text", nBuckets = 8,
      droppedCounter = Some(dropped))
    try q.processAllAvailable() finally q.stop()
    val state = corpusState(s"$base/corpus")
    assert(state.keySet === Set(1L, 2L, 10L, 21L),
      s"canonical ids must be the FIRST accepted copies, got $state")
    assert(state(10L) === "gamma text three")
    assert(dropped.value === 3) // doc 11 (historical), 12 (in-batch), 20 (cross-batch)
  }

  test("forget (right-to-be-forgotten): erasure tombstones the " +
      "content identity with no bucket rewrite, stored text stops " +
      "reading, identical content RE-ingests as a fresh canonical " +
      "copy, and purge removes the bytes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    HistoricalDedup.initCorpus(
      Seq((1L, "alpha text one"), (2L, "beta text two"),
        (3L, "gamma text three")).toDF("doc_id", "text"),
      s"$base/corpus", "doc_id", "text", nBuckets = 8)
    val before = PartitionedUpsert.manifestOrFail(spark, s"$base/corpus")
    // erase doc 1 by TEXT (normalization-insensitive — the shared hash)
    val touched = HistoricalDedup.forget(
      Seq("Alpha  TEXT one").toDF("text"), s"$base/corpus", "text")
    assert(touched.nonEmpty)
    val after = PartitionedUpsert.manifestOrFail(spark, s"$base/corpus")
    assert(after.buckets == before.buckets,
      "erasure must not rewrite a single bucket")
    assert(corpusState(s"$base/corpus").keySet === Set(2L, 3L))
    // identical content re-ingested: accepted FRESH under a new id —
    // forgotten means gone, not remembered-as-deleted
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(docLine(99, "alpha text one")).mkString("\n"))
    val stream = spark.readStream.schema(docSchema).json(srcDir)
    val q = HistoricalDedup.ingestSink(stream, s"$base/corpus",
      s"$base/ckpt", "doc_id", "text", nBuckets = 8)
    try q.processAllAvailable() finally q.stop()
    assert(corpusState(s"$base/corpus").keySet === Set(2L, 3L, 99L))
    // the physical bytes leave disk on the purge cadence; results hold
    PartitionedUpsert.purgeTombstones(spark, s"$base/corpus")
    assert(PartitionedUpsert.manifestOrFail(spark, s"$base/corpus")
      .tombs.isEmpty)
    assert(corpusState(s"$base/corpus").keySet === Set(2L, 3L, 99L))
    // erasure-list shape: precomputed hashes
    val h2 = PartitionedUpsert.read(spark, s"$base/corpus")
      .filter($"doc_id" === 2L).select($"content_hash")
    HistoricalDedup.forgetHashes(h2, s"$base/corpus", "content_hash")
    assert(corpusState(s"$base/corpus").keySet === Set(3L, 99L))
  }

  test("kill-and-resume keeps exactly-once: no duplicate hashes, " +
      "first ids preserved across the restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_hist_kr").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    import spark.implicits._
    HistoricalDedup.initCorpus(
      Seq((1L, "seed document text")).toDF("doc_id", "text"),
      s"$base/corpus", "doc_id", "text", nBuckets = 8)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(docLine(10, "first wave text"), docLine(11, "second wave text"))
        .mkString("\n"))
    def start() = HistoricalDedup.ingestSink(
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      s"$base/corpus", s"$base/ckpt", "doc_id", "text", nBuckets = 8)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill after wave 1
    assert(corpusState(s"$base/corpus").keySet === Set(1L, 10L, 11L))
    // wave 2 lands while the query is down: a re-crawl of doc 10's text
    // under a new id, plus a genuinely new doc
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(docLine(90, "first wave text"), docLine(91, "third wave text"))
        .mkString("\n"))
    val q2 = start() // resume from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()
    val state = corpusState(s"$base/corpus")
    assert(state.keySet === Set(1L, 10L, 11L, 91L),
      "the re-crawled copy must NOT steal canonical ownership")
    // no content hash appears twice — exactly-once survived the restart
    val dupHashes = PartitionedUpsert.read(spark, s"$base/corpus")
      .groupBy("content_hash").count().filter(col("count") > 1)
    assert(dupHashes.isEmpty)
  }

  test("history lookup is O(batch): a k-hash batch reads at most k " +
      "buckets of the corpus, whatever the corpus size") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_hist_obatch").toString
    // 500-doc corpus spread over 64 buckets
    val docs = (0L until 500L).map(i => (i, s"unique document body $i"))
      .toDF("doc_id", "text")
    HistoricalDedup.initCorpus(docs, s"$base/corpus", "doc_id", "text",
      nBuckets = 64)
    assert(PartitionedUpsert.bucketPaths(spark, s"$base/corpus").size > 30,
      "fixture must actually spread over many buckets")
    // a 3-doc "micro-batch" probes the table
    val probe = Seq((900L, "unique document body 7"),
      (901L, "unique document body 8"), (902L, "brand new text"))
      .toDF("doc_id", "text")
      .withColumn("content_hash", HistoricalDedup.contentHash($"text"))
    val read = PartitionedUpsert.readForKeys(spark, s"$base/corpus",
      probe.select("content_hash"), "content_hash")
    val filesTouched = read.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(filesTouched.length <= 3,
      s"3 hashes must read <= 3 buckets, read ${filesTouched.length}")
    // and the pruned read still finds exactly the 2 existing hashes
    val hits = probe.select("content_hash")
      .join(read.select("content_hash"), "content_hash").count()
    assert(hits === 2)
  }
}
