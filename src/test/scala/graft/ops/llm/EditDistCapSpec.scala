package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** The hot-prefix cap on edit-distance blocking: a planted boilerplate
  * prefix engages the cap with the overflow observable, pairs on every
  * surviving block are identical to the uncapped run, and the oracled
  * query's blocks stay far below the default cap. */
class EditDistCapSpec extends SparkSpec {

  private def titled(dir: String) =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), substring(lower(col("text")), 1, 40).as("title"))

  test("planted hot prefix engages the cap; surviving blocks unchanged") {
    import spark.implicits._
    val real = titled(sfSmoke)
    // 40 docs sharing one 16-char boilerplate prefix (ids above max)
    val mx = real.agg(max($"doc_id")).head().getLong(0)
    val hot = spark.range(1, 41)
      .select(($"id" + mx).as("doc_id"),
        concat(lit("click to accept "), $"id".cast("string")).as("title"))
    val corpus = real.unionByName(hot)
    val (pairs, overflowed) = LlmQueries2.editDistPairsWithStats(
      corpus, "doc_id", "title", maxBlockSize = 10)
    val of = overflowed.collect()
    assert(of.length == 1, "exactly the planted prefix must overflow")
    assert(of.head.getString(0) == "click to accept ")
    assert(of.head.getLong(1) == 40L)
    // no pair touches a hot-block doc
    val capped = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.forall { case (a, b) => a <= mx && b <= mx })
    // pairs on surviving blocks == the uncapped run restricted to them
    val (uncapped, none) = LlmQueries2.editDistPairsWithStats(
      corpus, "doc_id", "title", maxBlockSize = 1000)
    assert(none.isEmpty)
    val expected = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 <= mx && p._2 <= mx)
    assert(capped == expected)
  }

  test("oracled editdist blocks sit far below the default cap") {
    val blocks = titled(sf("sf0.01"))
      .groupBy(substring(col("title"), 1, 16)).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(blocks <= 100, s"probed max block $blocks — cap margin eroded")
  }
}
