package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate top-k terms per group via the MERGEABLE datasketches
  * frequent-items sketch (Spark 4's `approx_top_k` aggregate over the
  * bundled datasketches-java) — the 100 TB answer to "top tokens per
  * language" without shuffling the full (group, token) vocabulary.
  * The exact path (q_llm_tf: count + ranking window) partial-counts
  * map-side but still exchanges every distinct (group, token) pair a
  * partition saw; the sketch path exchanges ONE bounded sketch per
  * group per partition regardless of vocabulary size — MicroBench
  * measures the byte difference rather than asserting it.
  *
  * Approximation contract (Misra-Gries class, the published
  * frequent-items guarantee): no false negatives above the error
  * band — every item with true frequency > n/maxItemsTracked is
  * tracked — and a reported count under-estimates truth by at most
  * ~3.5·n/maxMapSize (datasketches bound); when the tracked map never
  * evicts (vocabulary ≤ capacity) counts are EXACT. Engine-specific
  * sketch internals → no DuckDB oracle; tolerance-tested in scalatest
  * against the exact aggregate (the q_agg_approx_hll precedent).
  * Top-k ORDER among equal counts is sketch-traversal order — treat
  * tied tails as sets, the way every approximate top-k consumer must.
  */
object FreqTerms {

  /** (groupCol, rk, token, cnt) — approximate top-k whitespace tokens
    * per group. `maxItemsTracked` is the accuracy dial: raise it until
    * the expected per-group vocabulary fits for exact counts, or
    * accept the ~3.5·n/capacity band for a bounded-memory sketch. */
  def approxTopTerms(docs: DataFrame, groupCol: String, textCol: String,
                     k: Int, maxItemsTracked: Int = 10000): DataFrame = {
    require(k >= 1 && maxItemsTracked >= k,
      s"need 1 <= k <= maxItemsTracked, got k=$k tracked=$maxItemsTracked")
    docs.select(col(groupCol), explode(split(col(textCol), " ")).as("__tok"))
      .groupBy(col(groupCol))
      .agg(expr(s"approx_top_k(__tok, $k, $maxItemsTracked)").as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")).as(Seq("__i", "__t")))
      .select(col(groupCol), (col("__i") + 1).cast("long").as("rk"),
        col("__t.item").as("token"), col("__t.count").as("cnt"))
  }
}
