package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** BPE tokenizer: encode-strategy equivalence (the oracle's stepwise
  * form vs the production all-at-once form), fixture-vocab freshness
  * (re-learned from the corpus it claims to come from), known
  * encodings, and the tokenizer mode of the chunk/pack family proven
  * against serial recomputation. */
class BpeSpec extends SparkSpec {

  private val ranks = Bpe.ranksOf(Bpe.FixtureMerges)

  test("known encodings under the fixture vocab") {
    // 'customer' and 'merge' are learned whole; unseen chars stay chars
    assert(Bpe.encode("customer", ranks) == Seq("customer"))
    assert(Bpe.encode("merge", ranks) == Seq("merge"))
    assert(Bpe.encode("merger", ranks) == Seq("merg", "er"))
    assert(Bpe.encode("xyz", ranks) == Seq("x", "y", "z"))
    assert(Bpe.encode("", ranks) == Seq.empty)
    // rank order decides: 'er' (rank 0) merges before 'st' would in 'erst'
    assert(Bpe.encode("erst", ranks) == Seq("er", "st"))
    assert(Bpe.tokenize("merge the customer", ranks) ==
      Seq("merge", "t", "h", "e", "customer"))
    assert(Bpe.tokenize(null, ranks) == Seq.empty)
  }

  test("all-at-once and stepwise encoding agree over the whole corpus") {
    val words = Tables.table(spark, sf("sf0.01"), "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(Bpe.encode(w, ranks) == Bpe.encodeStepwise(w, ranks),
        s"strategies diverge on '$w'")
    }
  }

  test("fixture merges re-derive from the corpus they were learned on") {
    val docs = Tables.table(spark, sf("sf0.01"), "documents")
      .select(lower(substring(col("text"), 1, 120)).as("t"))
    val learned = Bpe.learn(docs, "t", numMerges = Bpe.FixtureMerges.size)
    assert(learned == Bpe.FixtureMerges)
  }

  test("learn is deterministic under repartitioning") {
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
      .select(lower(col("text")).as("t"))
    val a = Bpe.learn(docs, "t", numMerges = 12)
    val b = Bpe.learn(docs.repartition(7), "t", numMerges = 12)
    assert(a == b)
  }

  test("learn caps driver vocabulary at maxWords without changing retained counts") {
    val docs = Tables.table(spark, sf("sf0.001"), "documents")
      .select(lower(col("text")).as("t"))
    val full = Bpe.learn(docs, "t", numMerges = 6)
    // a cap far above the vocabulary is a no-op
    val capped = Bpe.learn(docs, "t", numMerges = 6, maxWords = 1 << 20)
    assert(full == capped)
  }

  test("tokenizer-mode chunking equals serial recomputation") {
    val dir = sf("sf0.001")
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), lower(substring(col("text"), 1, 200)).as("text"))
    val toks = Bpe.tokensCol(spark, Bpe.FixtureMerges)
    val got = LlmQueries2.chunkTokens(docs, toks(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // serial reference: tokenize driver-side, slice the same windows
    val expected = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val t = Bpe.tokenize(r.getString(1), ranks)
      if (t.isEmpty) Seq.empty
      else (0 until t.size by 24).zipWithIndex.map { case (s, ci) =>
        val c = t.slice(s, s + 32)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(c.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, ci.toLong, c.size.toLong, md)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected.toSeq)
  }

  test("tokenizer-mode packing equals the serial one-window packer") {
    val dir = sf("sf0.001")
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        lower(substring(col("text"), 1, 200)).as("text"))
    val cnt = Bpe.countCol(spark, Bpe.FixtureMerges)
    val got = LlmQueries2.packTokens(docs, cnt(col("text")), budget = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // serial reference: per lang in doc_id order, greedy running bins
    val rows = docs.collect().map(r => (r.getString(1), r.getLong(0),
      Bpe.tokenize(r.getString(2), ranks).size.toLong))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
      var run = 0L
      val binned = rs.sortBy(_._2).map { case (_, _, n) =>
        val bin = run / 512; run += n; (bin, n)
      }
      binned.groupBy(_._1).toSeq.map { case (bin, xs) =>
        val tok = xs.map(_._2).sum
        (lang, bin, xs.size.toLong, tok,
          BigDecimal(tok / 512.0)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected.toSeq)
  }
}
