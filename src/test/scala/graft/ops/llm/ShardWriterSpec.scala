package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-budgeted shard writing: the corpus round-trips exactly, every
  * shard holds ~budget tokens (within one document), each shard dir is
  * ONE file, and the atomic manifest matches the data. */
class ShardWriterSpec extends SparkSpec {

  test("writeShards: budget-bounded one-file shards, exact round-trip, " +
      "manifest published last and consistent") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select($"doc_id", $"lang", $"text")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val budget = 2000
    val manifest = CorpusPipeline.writeShards(
      docs, out, "doc_id", "text", "lang", tokensPerShard = budget)
    val m = manifest.collect()
    assert(m.nonEmpty)

    // round-trip: every doc present exactly once, text intact
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() === docs.count())
    assert(back.select($"doc_id", $"text")
      .exceptAll(docs.select($"doc_id", $"text")).isEmpty)

    // budget: a doc lands in the shard its START falls in, so every
    // shard's total is < budget + its largest doc; every non-final
    // shard of a stratum reaches at least the budget boundary
    val maxDoc = docs.select(max(size(split($"text", " ")))).head().getInt(0)
    val perStratumLast = m.groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(1)).max }
    m.foreach { r =>
      val (stratum, shard, tokens) = (r.getString(0), r.getLong(1), r.getLong(3))
      assert(tokens < budget + maxDoc,
        s"$stratum/$shard holds $tokens tokens (budget $budget, max doc $maxDoc)")
      if (shard != perStratumLast(stratum))
        assert(tokens > budget - maxDoc,
          s"non-final $stratum/$shard underfilled: $tokens")
    }

    // one data file per shard dir (the repartitionByRange guarantee)
    m.foreach { r =>
      val dir = new java.io.File(
        s"$out/data/stratum=${r.getString(0)}/shard=${r.getLong(1)}")
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"$dir has ${parts.length} files")
    }

    // manifest matches the written data and was published atomically
    // partition-dir columns read back with inferred (int) types — cast
    val fromData = back
      .groupBy($"stratum".cast("string").as("stratum"),
        $"shard".cast("long").as("shard"))
      .agg(count(lit(1)).as("docs"),
        sum(size(split($"text", " ")).cast("long")).as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    m.foreach { r =>
      assert(fromData((r.getString(0), r.getLong(1))) ===
        ((r.getLong(2), r.getLong(3))))
    }
    val done = new java.io.File(s"$out/_manifest/done.tsv")
    assert(done.exists)
    val lines = scala.io.Source.fromFile(done).getLines().toSeq
    assert(lines.length === m.length)
  }
}
