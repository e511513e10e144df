package graft.ops.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Frequent-items sketch top-k vs the exact aggregate: exact counts
  * when the tracked map never evicts, heavy hitters within the
  * published error band under forced eviction, and partition-count
  * invariance (mergeability). */
class FreqTermsSpec extends SparkSpec {

  test("no eviction => counts EXACT and top-k set matches the exact aggregate") {
    import spark.implicits._
    val docs = Tables.table(spark, sf("sf0.01"), "documents")
    val approx = FreqTerms.approxTopTerms(docs, "lang", "text",
        k = 5, maxItemsTracked = 100000)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    val tok = docs.select($"lang", explode(split($"text", " ")).as("token"))
    val exact = tok.groupBy($"lang", $"token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token".asc)
    val exactTop = exact.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every sketched count is the true count (capacity >> vocabulary)
    val exactAll = exact.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    approx.foreach { case (key, c) =>
      assert(exactAll(key) == c, s"sketched count for $key diverges")
    }
    // per-lang count MULTISETS match (tie ORDER at the boundary is the
    // sketch's to choose; the counts themselves cannot differ)
    val byLang = (m: Map[(String, String), Long]) =>
      m.groupBy(_._1._1).map { case (l, g) => l -> g.values.toSeq.sorted }
    assert(byLang(approx) == byLang(exactTop))
  }

  test("forced eviction: heavy hitters surface with counts inside the error band") {
    import spark.implicits._
    // skewed stream: two heavy hitters over a 500-token uniform tail
    val tokens = Seq.fill(1000)("heavyone") ++ Seq.fill(500)("heavytwo") ++
      (0 until 500).map(i => s"tail$i")
    val n = tokens.size
    val docs = tokens.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("g", lit("all"))
    val tracked = 64
    val out = FreqTerms.approxTopTerms(docs, "g", "text", k = 2,
        maxItemsTracked = tracked)
      .collect().map(r => r.getString(2) -> (r.getLong(1), r.getLong(3))).toMap
    val bound = 3.5 * n / tracked
    assert(out.contains("heavyone") && out.contains("heavytwo"),
      s"heavy hitters (freq >> n/$tracked) must never be false negatives, got $out")
    assert(out("heavyone")._1 == 1L, "the dominant item ranks first")
    assert(math.abs(out("heavyone")._2 - 1000L) <= bound,
      s"heavyone count ${out("heavyone")._2} outside ±$bound of 1000")
    assert(math.abs(out("heavytwo")._2 - 500L) <= bound,
      s"heavytwo count ${out("heavytwo")._2} outside ±$bound of 500")
  }

  test("mergeability: partitioning does not change the no-eviction result") {
    import spark.implicits._
    val docs = Tables.table(spark, sfSmoke, "documents")
    def run(parts: Int) = FreqTerms.approxTopTerms(
        docs.repartition(parts), "lang", "text", k = 3,
        maxItemsTracked = 100000)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSet
    assert(run(1) == run(16),
      "per-partition sketches must merge to the single-partition answer")
  }
}
