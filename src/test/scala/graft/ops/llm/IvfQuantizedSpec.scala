package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8-quantized IVF index: int8 codes + per-vector scale in the
  * assignment files, dequantized-dot scoring, exact re-rank against
  * the full-precision source. The index must be measurably smaller,
  * recall against the full-precision search must clear a stated
  * bound, and the lifecycle operations (append, compact, retrain,
  * time travel) must keep working on the quantized schema. */
class IvfQuantizedSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def hitSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getLong(2)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recall(got: Map[Long, Set[Long]],
                     want: Map[Long, Set[Long]]): Double = {
    val per = want.toSeq.map { case (q, w) =>
      if (w.isEmpty) 1.0
      else got.getOrElse(q, Set.empty).intersect(w).size.toDouble / w.size
    }
    per.sum / per.length
  }

  test("sq8 index: smaller on disk, recall vs full precision >= 0.9 " +
      "raw and >= 0.99 with exact re-rank") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfq").toString
    val (fullDir, qDir) = (s"$base/full", s"$base/sq8")
    IvfIndex.build(emb, fullDir, dim = 64, k = 8, iters = 3)
    IvfIndex.build(emb, qDir, dim = 64, k = 8, iters = 3, quantized = true)
    // identical codebooks (same corpus, same seed) → same probe sets,
    // so the comparison isolates the quantization effect
    assert(IvfIndex.codebook(spark, qDir).map(_.toSeq).toSeq ===
      IvfIndex.codebook(spark, fullDir).map(_.toSeq).toSeq)
    val (_, fullBytes) = IvfIndex.indexStats(spark, fullDir)
    val (_, qBytes) = IvfIndex.indexStats(spark, qDir)
    assert(qBytes < fullBytes * 0.6,
      s"sq8 must cut the index well below full precision: $qBytes vs $fullBytes")
    val queries = emb.filter(col("vec_id") < 25)
    val want = hitSets(IvfIndex.search(spark, fullDir, queries, 5, 2))
    val raw = hitSets(IvfIndex.search(spark, qDir, queries, 5, 2))
    assert(recall(raw, want) >= 0.9,
      s"raw dequantized recall ${recall(raw, want)} below 0.9")
    val refined = hitSets(IvfIndex.search(spark, qDir, queries, 5, 2,
      refine = Some((emb, 4))))
    assert(recall(refined, want) >= 0.99,
      s"refined recall ${recall(refined, want)} below 0.99")
    // refined similarities are EXACT — equal to the full index's for
    // the hits both agree on (round-4 values from the same dots)
    val fSims = IvfIndex.search(spark, fullDir, queries, 5, 2).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val rSims = IvfIndex.search(spark, qDir, queries, 5, 2,
        refine = Some((emb, 4))).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = fSims.keySet.intersect(rSims.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(fSims(k) === rSims(k),
      s"refined sim must be the exact dot for $k"))
  }

  test("lifecycle on the quantized schema: append, compact, retrain + " +
      "time travel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfq_l")
      .toString + "/idx"
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    IvfIndex.build(first, dir, dim = 64, k = 4, iters = 2, quantized = true)
    IvfIndex.append(spark, dir, rest)
    val queries = emb.filter(col("vec_id") < 10)
    // probe-ALL (nprobe = k): results are exhaustive, so comparisons
    // across retrains isolate quantization from codebook/probing drift
    val grown = hitSets(IvfIndex.search(spark, dir, queries, 5, 4,
      refine = Some((emb, 4))))
    assert(grown.values.exists(_.exists(_ % 2 == 1)),
      "appended (odd) vectors must be findable")
    // compaction is bit-identical data → identical results
    val before = hitSets(IvfIndex.search(spark, dir, queries, 5, 2))
    assert(IvfIndex.compactIndex(spark, dir, maxFilesPerCid = 1).nonEmpty)
    assert(hitSets(IvfIndex.search(spark, dir, queries, 5, 2)) === before)
    // retrain re-codes from reconstructions and stays quantized
    val v2 = IvfIndex.history(spark, dir).head
    IvfIndex.retrain(spark, dir, k = 4, iters = 2)
    assert(IvfIndex.currentManifest(spark, dir).get.quantized)
    val post = hitSets(IvfIndex.search(spark, dir, queries, 5, 4,
      refine = Some((emb, 4))))
    assert(recall(post, grown) >= 0.95,
      "probe-all exact-reranked results must survive a quantized retrain")
    // time travel: the pre-retrain version still answers identically
    assert(hitSets(IvfIndex.searchVersion(spark, dir, v2, queries, 5, 2))
      === before)
    // STALE refine source (missing the appended odd vectors): hits the
    // source lacks keep their quantized score instead of vanishing —
    // every query still gets its full k results
    val stale = IvfIndex.search(spark, dir, queries, 5, 4,
      refine = Some((first, 4)))
    val perQuery = stale.collect().groupBy(_.getLong(0)).view
      .mapValues(_.length).toMap
    assert(perQuery.nonEmpty && perQuery.values.forall(_ === 5),
      s"stale refine source must not shrink result sets: $perQuery")
    // tombstone delete works on the quantized schema (the anti-join is
    // schema-agnostic, but prove it): deleted id gone at probe-all,
    // incl. through the refine path; reclaim rewrites the int8 files
    IvfIndex.delete(spark, dir, emb.filter(col("vec_id") === 8)
      .select(col("vec_id")))
    val afterDel = hitSets(IvfIndex.search(spark, dir, queries, 5, 4,
      excludeSelfId = false, refine = Some((emb, 4))))
    assert(!afterDel.values.exists(_.contains(8L)),
      "deleted vector must not surface from a quantized index")
    IvfIndex.compactIndex(spark, dir, maxFilesPerCid = 1000,
      reclaimDeletes = true)
    val m = IvfIndex.currentManifest(spark, dir).get
    assert(m.quantized && m.tombstones.isEmpty)
    assert(!hitSets(IvfIndex.search(spark, dir, queries, 5, 4,
        excludeSelfId = false)).values.exists(_.contains(8L)))
  }
}
