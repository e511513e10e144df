package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup semantics: within-cluster paraphrase groups collapse to
  * the centroid-farthest member, cross-cluster twins are invisible by
  * design, and the opt-in CorpusPipeline stage drops embedding-level
  * paraphrases that token-based dedup cannot see. Cross-engine
  * arithmetic is certified by the oracled q_llm_semdedup key. */
class SemDedupSpec extends SparkSpec {

  private val cents = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0))

  test("paraphrase cluster collapses to the LOWEST-centroid-sim member") {
    import spark.implicits._
    // a/b/c mutually cosine-similar (>0.999), centroid-sim strictly
    // decreasing a > b > c; d sits alone in cluster 1
    val vecs = Seq(
      (1L, Seq(10.0, 1.0, 0.0, 0.0)),
      (2L, Seq(10.0, 1.2, 0.0, 0.0)),
      (3L, Seq(10.0, 1.4, 0.0, 0.0)),
      (4L, Seq(0.0, 5.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val rep = SemDedup.report(vecs, "vec_id", "embedding", cents, 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rep(1L) == ((0L, false)) && rep(2L) == ((0L, false)),
      "higher-centroid-sim members of the group must drop")
    assert(rep(3L) == ((0L, true)),
      "the centroid-farthest (most diverse) member survives")
    assert(rep(4L) == ((1L, true)), "a lone vector in its cluster survives")
  }

  test("cross-cluster twins are not compared; zero-norm vectors drop") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.9, 0.0, 0.0)),  // cluster 0 (csim 0.743)
      (2L, Seq(0.9, 1.0, 0.0, 0.0)),  // cluster 1, cosine 0.994 to vec 1
      (3L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding", cents, 0.95)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L),
      "blocked by cluster: the cross-cluster twin pair survives whole; " +
        "the zero-norm vector has no similarity and drops")
  }

  test("semDedup keeps original columns and is deterministic") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(10.0, 1.0, 0.0, 0.0), "keepmeta"),
      (2L, Seq(10.0, 1.2, 0.0, 0.0), "dropmeta")).toDF("vec_id", "embedding", "meta")
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding", cents, 0.95)
    assert(out.columns.toSeq == Seq("vec_id", "embedding", "meta"))
    assert(out.select($"vec_id", $"meta").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "dropmeta")))
    val again = SemDedup.semDedup(vecs, "vec_id", "embedding", cents, 0.95)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("pipeline stage 4.5: embedding paraphrases collapse; token dedup alone misses them") {
    import spark.implicits._
    // two docs with DISJOINT vocabularies (MinHash Jaccard 0) but
    // near-identical embeddings — only the semantic stage can pair them
    val words1 = (0 until 25).map(k => s"alpha$k").mkString(" ")
    val words2 = (0 until 25).map(k => s"beta$k").mkString(" ")
    val words3 = (0 until 25).map(k => s"gamma$k").mkString(" ")
    val docs = Seq(
      (1L, words1, "en", Seq(10.0, 1.0, 0.0, 0.0)),
      (2L, words2, "en", Seq(10.0, 1.2, 0.0, 0.0)),
      (3L, words3, "en", Seq(0.0, 5.0, 1.0, 0.0))).toDF(
      "doc_id", "text", "lang", "embedding")
    val on = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(semDedupCentroids = Some(cents)))
    assert(on.select($"doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L),
      "paraphrase doc 1 (higher centroid-sim) must drop; 2 and 3 survive")
    val off = CorpusPipeline.prepare(docs, "doc_id", "text", "lang")
    assert(off.count() == 3, "token-based stages alone keep all three")
  }
}
