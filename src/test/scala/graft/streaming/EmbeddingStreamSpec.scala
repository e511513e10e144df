package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.llm.IvfIndex

/** Streaming ANN-index maintenance: appended vectors become findable,
  * restarts are exactly-once (no duplicated assignments), and an
  * explicitly replayed batch is a manifest no-op. */
class EmbeddingStreamSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def writeWave(dir: String, name: String,
                        rows: Seq[org.apache.spark.sql.Row]): Unit = {
    val lines = rows.map { r =>
      val v = r.getSeq[Float](1).mkString(",")
      s"""{"vec_id":${r.getLong(0)},"embedding":[$v]}"""
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/$name"), lines.mkString("\n")): Unit
  }

  test("batch-level replay of a txn'd append is a no-op; streaming " +
      "kill-and-resume neither loses nor duplicates vectors") {
    val base = java.nio.file.Files.createTempDirectory("graft_embs").toString
    val (idxDir, srcDir, ckpt) = (s"$base/idx", s"$base/in", s"$base/ckpt")
    new java.io.File(srcDir).mkdirs()
    val seed = emb.filter(col("vec_id") < 30)
    IvfIndex.build(seed, idxDir, dim = 64, k = 4, iters = 2)
    // direct txn idempotence, no stream in the way
    val extra = emb.filter(col("vec_id") >= 30 && col("vec_id") < 35)
    IvfIndex.append(spark, idxDir, extra, txn = Some(("app", 1L)))
    val v = IvfIndex.history(spark, idxDir).head
    IvfIndex.append(spark, idxDir, extra, txn = Some(("app", 1L)))
    assert(IvfIndex.history(spark, idxDir).head === v,
      "replayed append must burn no version")
    assert(IvfIndex.readVectors(spark, idxDir).count() === 35)

    // streaming: wave 1, kill, wave 2 from the same checkpoint
    val w1 = emb.filter(col("vec_id") >= 35 && col("vec_id") < 40).collect()
    val w2 = emb.filter(col("vec_id") >= 40 && col("vec_id") < 45).collect()
    def start() = EmbeddingStream.appendSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      idxDir, ckpt)
    writeWave(srcDir, "f1.json", w1.toSeq)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    writeWave(srcDir, "f2.json", w2.toSeq)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val stored = IvfIndex.readVectors(spark, idxDir)
      .groupBy(col("vec_id")).count().collect()
    assert(stored.length === 45, s"expected 45 distinct ids, got ${stored.length}")
    assert(stored.forall(_.getLong(1) === 1L),
      "no vector may be assigned twice after the restart")
    // wave 3: an at-least-once upstream REDELIVERS wave-1 vectors in a
    // brand-new batch (different batchId — the txn guard alone cannot
    // catch it) alongside genuinely new ids: the cross-batch vec_id
    // dedup must drop the stale copies, state surviving the restart
    val w3 = emb.filter(col("vec_id") >= 45 && col("vec_id") < 50).collect()
    writeWave(srcDir, "f3.json", (w1 ++ w3).toSeq)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val stored3 = IvfIndex.readVectors(spark, idxDir)
      .groupBy(col("vec_id")).count().collect()
    assert(stored3.length === 50, s"expected 50 distinct ids, got ${stored3.length}")
    assert(stored3.forall(_.getLong(1) === 1L),
      "a redelivered vec_id in a later batch must not re-enter the index")
    // appended vectors are findable through the index
    val hits = IvfIndex.search(spark, idxDir,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 4)
      .collect().map(_.getLong(2)).toSet
    assert(hits.exists(_ >= 35), "streamed vectors must be searchable")
  }

  test("deleteSink: streamed ids vanish from search; kill-and-resume " +
      "applies each delete wave exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft_embd").toString
    val (idxDir, srcDir, ckpt) = (s"$base/idx", s"$base/in", s"$base/ckpt")
    new java.io.File(srcDir).mkdirs()
    IvfIndex.build(emb.filter(col("vec_id") < 40), idxDir, dim = 64,
      k = 4, iters = 2)
    val idSchema = StructType(Seq(StructField("vec_id", LongType)))
    def writeIds(name: String, ids: Seq[Long]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/$name"),
        ids.map(i => s"""{"vec_id":$i}""").mkString("\n")): Unit
    def start() = EmbeddingStream.deleteSink(
      spark.readStream.schema(idSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      idxDir, ckpt)
    writeIds("d1.json", Seq(3L, 11L))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(IvfIndex.readVectors(spark, idxDir).count() === 38)
    // kill-and-resume with a second wave: first wave must not re-apply
    val vAfterW1 = IvfIndex.history(spark, idxDir).head
    writeIds("d2.json", Seq(17L))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(IvfIndex.readVectors(spark, idxDir).count() === 37)
    assert(IvfIndex.history(spark, idxDir).head === vAfterW1 + 1,
      "resume must apply exactly the new wave, one version")
    // deleted ids never surface in a probe-all search
    val kc = IvfIndex.codebook(spark, idxDir).length
    val hits = IvfIndex.search(spark, idxDir,
        emb.filter(col("vec_id") < 10), k = 10, nprobe = kc,
        excludeSelfId = false)
      .collect().map(_.getLong(2)).toSet
    assert(!hits.contains(3L) && !hits.contains(11L) && !hits.contains(17L))
  }

  test("appendSink on a missing index fails at start, not per batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_embm").toString
    new java.io.File(s"$base/in").mkdirs()
    intercept[IllegalStateException] {
      EmbeddingStream.appendSink(
        spark.readStream.schema(schema).json(s"$base/in"),
        s"$base/nope", s"$base/ckpt")
    }
  }
}
