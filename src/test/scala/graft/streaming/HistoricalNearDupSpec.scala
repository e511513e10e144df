package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert

/** Streaming near-dup dedup against the accumulated corpus: fuzzy
  * matches of historical docs are dropped, the band index grows with
  * every accepted batch, and restarts keep exactly-once. */
class HistoricalNearDupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docLine(id: Long, text: String) =
    s"""{"doc_id":$id,"text":"$text"}"""

  // ~20-token docs with disjoint vocabularies; a 1-token edit keeps
  // Jaccard ≈ 19/21 ≈ 0.905, far above the 0.8 threshold, while
  // distinct docs share nothing
  private val textA = "alpha one two three four five six seven eight nine " +
    "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
  private val textB = "bravo red orange yellow green blue indigo violet " +
    "black white gray pink brown cyan magenta lime teal navy maroon olive"
  private val textC = "carol apple banana cherry date elderberry fig grape " +
    "honeydew kiwi lemon mango nectarine papaya quince raspberry strawberry " +
    "tangerine ugli vanilla"
  private def edit(t: String, to: String): String = {
    val toks = t.split(" "); toks(toks.length - 1) = to; toks.mkString(" ")
  }

  private val cfg = HistoricalNearDup.Config(k = 16, bands = 8, threshold = 0.8)

  private def acceptedIds(sigDir: String): Set[Long] =
    PartitionedUpsert.read(spark, sigDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("fuzzy copies of historical, within-batch, and earlier-batch docs " +
      "are dropped; genuinely new docs are indexed") {
    val base = java.nio.file.Files.createTempDirectory("graft_hnd").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    import spark.implicits._
    HistoricalNearDup.initCorpus(
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      s"$base/sig", s"$base/band", "doc_id", "text", cfg, nBuckets = 8)
    // batch 1: near-dup of historical A; new doc C; within-batch
    // near-dup of C (higher id loses)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(docLine(10, edit(textA, "twenty")),
        docLine(11, textC),
        docLine(12, edit(textC, "walnut"))).mkString("\n"))
    // batch 2: near-dup of batch-1-ACCEPTED doc 11 (a different edit,
    // so it never met doc 12) — only the incrementally-updated band
    // index can catch it; plus one genuinely new doc
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(docLine(20, edit(textC, "xigua")),
        docLine(21, "delta zebra yak xerus wolf vulture toucan swan " +
          "raven quail pelican owl newt moose lynx koala jackal ibex heron gazelle"))
        .mkString("\n"))
    val dropped = spark.sparkContext.longAccumulator("nd_dropped")
    val q = HistoricalNearDup.ingestSink(
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      s"$base/sig", s"$base/band", s"$base/ckpt", "doc_id", "text", cfg,
      nBuckets = 8, droppedCounter = Some(dropped))
    try q.processAllAvailable() finally q.stop()
    assert(acceptedIds(s"$base/sig") === Set(1L, 2L, 11L, 21L),
      "near-dups of history (10), within-batch (12) and cross-batch (20) must drop")
    assert(dropped.value === 3)
    // the band index covers exactly the accepted docs
    val members = PartitionedUpsert.read(spark, s"$base/band")
      .select(explode(col("members")).as("m"))
      .collect().map(_.getLong(0)).toSet
    assert(members === Set(1L, 2L, 11L, 21L))
  }

  test("band-index cap: an overflowing bucket keeps the smallest cap " +
      "members and raises the overflow flag — never silently") {
    import spark.implicits._
    val small = HistoricalNearDup.Config(k = 16, bands = 8,
      threshold = 0.8, maxBucketMembers = 2)
    val prior = Seq(("0:7", Seq(1L, 2L), false))
      .toDF("bkey", "members", "overflowed")
    val newKeys = Seq((3L, "0:7"), (9L, "0:7"), (5L, "1:4"))
      .toDF("doc_id", "bkey")
    val out = HistoricalNearDup.bandRows(newKeys, prior, small)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getBoolean(2)))).toMap
    assert(out("0:7") === ((Seq(1L, 2L), true)),
      "full bucket keeps its cap members and flags the overflow")
    assert(out("1:4") === ((Seq(5L), false)),
      "a fresh under-cap bucket carries no flag")
  }

  test("band-index cap: a new smaller doc_id never evicts an " +
      "already-indexed member, and replayed ids fold to a no-op") {
    import spark.implicits._
    val small = HistoricalNearDup.Config(k = 16, bands = 8,
      threshold = 0.8, maxBucketMembers = 3)
    val prior = Seq(("0:7", Seq(5L, 9L), false))
      .toDF("bkey", "members", "overflowed")
    // ids 1 and 2 both sort BEFORE every existing member; only one
    // slot is free — the eviction-prone formulation would keep (1,2,5)
    // and orphan 9 in the sig table forever
    val newKeys = Seq((1L, "0:7"), (2L, "0:7"), (9L, "0:7"))
      .toDF("doc_id", "bkey")
    val out = HistoricalNearDup.bandRows(newKeys, prior, small)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getBoolean(2)))).toMap
    val (members, over) = out("0:7")
    assert(members.toSet.intersect(Set(5L, 9L)) === Set(5L, 9L),
      "existing members must survive the cap")
    assert(members === Seq(5L, 9L, 1L),
      "one free slot goes to the smallest NEW id; 9 (replayed) is a no-op")
    assert(over, "the dropped new id 2 must raise the overflow flag")
  }

  test("planted duplicate groups: exactly ONE representative per group " +
      "survives across init + two batches (randomized grouping)") {
    val base = java.nio.file.Files.createTempDirectory("graft_hnd_gp").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    import spark.implicits._
    // 8 disjoint-vocabulary base texts; each group = the base + light
    // edits of it (J >= 0.9); docs are dealt across init/batch1/batch2
    // by a fixed pseudo-random schedule
    val bases = (0 until 8).map { g =>
      (0 until 20).map(i => s"g${g}w${i}").mkString(" ")
    }
    val rnd = new scala.util.Random(777L)
    val docs = for {
      g <- 0 until 8
      copy <- 0 until 3
    } yield {
      val id = (g * 10 + copy).toLong
      val text = if (copy == 0) bases(g) else edit(bases(g), s"e$g$copy")
      // initCorpus documents a PRE-DEDUPED corpus, so at most the
      // first copy of a group may land there; later copies go to the
      // streaming batches (0 = init, 1 = batch 1, 2 = batch 2)
      val slot = if (copy == 0) rnd.nextInt(2) else 1 + rnd.nextInt(2)
      (id, text, slot)
    }
    val init = docs.filter(_._3 == 0).map(d => (d._1, d._2))
    HistoricalNearDup.initCorpus(
      (if (init.nonEmpty) init
       else Seq((999L, "seed only doc for an empty draw"))).toDF("doc_id", "text"),
      s"$base/sig", s"$base/band", "doc_id", "text", cfg, nBuckets = 8)
    for (b <- 1 to 2)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f$b.json"),
        docs.filter(_._3 == b).map(d => docLine(d._1, d._2)).mkString("\n"))
    val q = HistoricalNearDup.ingestSink(
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      s"$base/sig", s"$base/band", s"$base/ckpt", "doc_id", "text", cfg,
      nBuckets = 8)
    try q.processAllAvailable() finally q.stop()
    // every group contributed >= 1 doc somewhere; exactly one survives
    val accepted = acceptedIds(s"$base/sig").filter(_ != 999L)
    val byGroup = accepted.groupBy(_ / 10)
    assert(byGroup.keySet === (0 until 8).map(_.toLong).toSet,
      s"every group must keep a representative: $byGroup")
    byGroup.foreach { case (g, ids) =>
      assert(ids.size === 1, s"group $g kept ${ids.size} copies: $ids")
    }
  }

  test("kill-and-resume: restart keeps exactly-once, no duplicate " +
      "signature rows, accepted docs stay visible to later batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_hnd_kr").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    import spark.implicits._
    HistoricalNearDup.initCorpus(
      Seq((1L, textA)).toDF("doc_id", "text"),
      s"$base/sig", s"$base/band", "doc_id", "text", cfg, nBuckets = 8)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(docLine(10, textB)).mkString("\n"))
    def start() = HistoricalNearDup.ingestSink(
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      s"$base/sig", s"$base/band", s"$base/ckpt", "doc_id", "text", cfg,
      nBuckets = 8)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(acceptedIds(s"$base/sig") === Set(1L, 10L))
    // while down: a fuzzy copy of the batch-1 doc and a new doc arrive
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(docLine(90, edit(textB, "crimson")), docLine(91, textC))
        .mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(acceptedIds(s"$base/sig") === Set(1L, 10L, 91L))
    val dup = PartitionedUpsert.read(spark, s"$base/sig")
      .groupBy("doc_id").count().filter(col("count") > 1)
    assert(dup.isEmpty)
  }
}
