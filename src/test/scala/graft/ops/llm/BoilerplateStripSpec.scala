package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Span-level repeated-text removal: partial (not whole-doc) excision
  * of corpus-repeated n-gram spans, boundary behavior, and the opt-in
  * CorpusPipeline stage (strip before dedup; fully-template docs
  * dropped). The cross-engine arithmetic itself is certified by the
  * oracled q_llm_boilerplate_strip key. */
class BoilerplateStripSpec extends SparkSpec {

  test("stripRepeatedSpans excises exactly the shared span; unique text survives") {
    import spark.implicits._
    // T1..T4 is the shared template; boundary grams that mix unique
    // and template tokens occur in one doc each and must NOT extend
    // the excised span into the unique text
    val docs = Seq(
      (1L, "a1 a2 T1 T2 T3 T4 a3"),
      (2L, "b1 T1 T2 T3 T4 b2 b3"),
      (3L, "T1 T2 T3 T4"),
      (4L, "c1 c2 c3"),
      (5L, "d1 d2")).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(docs, "doc_id", "text",
        n = 3, minDocs = 2)
      .select($"doc_id", $"stripped", $"n_tokens", $"n_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("a1 a2 a3", 7L, 4L)), "partial removal, prefix+suffix kept")
    assert(out(2L) == (("b1 b2 b3", 7L, 4L)))
    assert(out(3L) == (("", 4L, 4L)), "all-template doc strips to empty")
    assert(out(4L) == (("c1 c2 c3", 3L, 0L)), "unique 3-gram doc untouched")
    assert(out(5L) == (("d1 d2", 2L, 0L)), "doc shorter than n carries no gram")
  }

  test("a span repeated only WITHIN one doc is not corpus-repeated") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x1 R1 R2 R3 x2 R1 R2 R3 x3"),
      (2L, "y1 y2 y3 y4")).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(docs, "doc_id", "text",
        n = 3, minDocs = 2)
      .select($"doc_id", $"n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L, "minDocs counts DISTINCT docs — intra-doc repeats don't excise")
  }

  test("pipeline stage 2.5: template spans excised before dedup, all-template doc dropped") {
    import spark.implicits._
    val uniq1 = (0 until 20).map(k => s"u${k}one").mkString(" ")
    val uniq2 = (0 until 20).map(k => s"u${k}two").mkString(" ")
    val tmpl = (0 until 12).map(k => s"tm$k").mkString(" ")
    val docs = Seq(
      (1L, s"$uniq1 $tmpl", "en"),
      (2L, s"$uniq2 $tmpl", "en"),
      (3L, s"$tmpl $tmpl $tmpl", "en")).toDF("doc_id", "text", "lang")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(stripSpans = true))
    val byId = out.select($"doc_id", $"redacted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set(1L, 2L),
      s"all-template doc must strip to empty and drop, got ${byId.keySet}")
    assert(byId(1L) == uniq1 && byId(2L) == uniq2,
      "exactly the shared template must be excised from survivors")
    // without the stage the template rides through untouched
    val off = CorpusPipeline.prepare(docs, "doc_id", "text", "lang")
    assert(off.count() == 3 &&
      off.filter($"redacted".contains("tm0")).count() == 3)
  }

  test("pipeline stage 2.6: benchmark spans excised from the corpus, " +
      "pure-leakage doc dropped, stage off by default") {
    import spark.implicits._
    val answer = (0 until 10).map(i => s"z$i").mkString(" ")
    val filler = (0 until 20).map(i => s"f$i")
    val docs = Seq(
      (1L, (filler.take(10) ++ answer.split(" ") ++ filler.drop(10)).mkString(" "), "en"),
      // distinct filler: after doc 1's strip the two must NOT become
      // near-duplicates (stage 4 would then keep only the min id)
      (2L, (0 until 20).map(i => s"g$i").mkString(" ") + " the a extra pad", "en"),
      (3L, answer, "en") // NOTHING but the answer -> pure leakage
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((9L, s"prompt $answer done")).toDF("bid", "btext")
    val cfg = CorpusPipeline.Config(minWords = 5,
      decontamBench = Some(bench), decontamBenchTextCol = "btext")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text", "lang", cfg)
    val byId = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap
    assert(!byId.contains(3L), "pure-leakage doc must drop")
    assert(byId.contains(1L) && !byId(1L).contains("z0"),
      s"answer span survived: ${byId.get(1L)}")
    assert(byId(2L).contains("g0"), "clean doc must pass untouched")
    // stage off: the answer rides through
    val off = CorpusPipeline.prepare(docs, "doc_id", "text", "lang",
      CorpusPipeline.Config(minWords = 5))
    assert(off.filter($"redacted".contains("z0")).count() >= 1)
  }

  test("stripContaminatedSpans: only benchmark-covered spans excise; " +
      "clean training text is untouched; within-train repetition is NOT " +
      "contamination") {
    import spark.implicits._
    val answer = (0 until 10).map(i => s"a$i").mkString(" ")
    val bench = Seq((100L, s"q1 $answer q2")).toDF("bid", "btext")
    val train = Seq(
      // embeds the benchmark answer mid-text -> span excised
      (1L, s"u1 u2 $answer u3 u4"),
      // clean doc, repeated WITHIN train but absent from bench -> kept
      (2L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("doc_id", "text")
    val out = Boilerplate
      .stripContaminatedSpans(train, "doc_id", "text", bench, "btext")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("stripped"), r.getAs[Long]("n_removed"))).toMap
    assert(out(1L)._1 === "u1 u2 u3 u4", s"got: ${out(1L)._1}")
    assert(out(1L)._2 === 10L)
    assert(out(2L) === (("w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", 0L)))
    assert(out(3L)._2 === 0L)
  }
}
