package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the n-gram-overlap audit every
  * serious training pipeline runs before trusting an eval split (the
  * published form of this check is GPT-3's 13-gram dedup between
  * training data and benchmarks; the mechanism is identical at any n).
  *
  * Scale shape: shingle both sides, distinct, and hash-join on the
  * shingle — ONE shuffle keyed by shingle, the same shape as every
  * dedup candidate generator here. At 100 TB, pass
  * `hashJoinKeys = true`: both sides then distinct/join on
  * `xxhash64(shingle)` and the n-token strings never enter a shuffle
  * (MicroBench measures the shuffled-bytes reduction). A 64-bit
  * collision can only conflate two shingles — at worst one spurious
  * or one merged hit per colliding pair, absorbed by the per-doc
  * threshold — so the flag is a pure transport optimization. The
  * string form stays the default because the oracle compares it
  * cross-engine (xxhash64's seed is Spark-specific, PARITY rule 19).
  */
object Contamination {

  /** Distinct n-TOKEN shingles per row: windows of `n` consecutive
    * tokens joined by a single space. Rows with fewer than n tokens
    * yield no shingles. `toksCol` must be an already-materialized
    * array column (see the [[NearDup.charShingles]] lambda-inlining
    * note — an inline `split()` here would re-split per window). */
  def tokenShingles(toksCol: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    when(size(toksCol) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toksCol) - (n - 1)),
        i => array_join(slice(toksCol, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document contamination report: for every doc in `probeSplit`,
    * the number of distinct n-token shingles it shares with ANY doc in
    * `corpusSplit`, plus the flag at `minHits`. Splits come from a
    * column (e.g. [[Sampling.assignSplit]]); docs with zero shared
    * shingles are absent (join semantics — the clean majority would
    * dominate the output otherwise). */
  def crossSplitOverlap(docs: DataFrame, idCol: String, textCol: String,
                        splitCol: String, probeSplit: String,
                        corpusSplit: String, n: Int = 4,
                        minHits: Int = 5,
                        hashJoinKeys: Boolean = false): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("doc_id"), col(splitCol).as("split"),
        split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("split"),
        explode(tokenShingles(col("toks"), n)).as("shingle"))
    // the key projection happens BEFORE the distincts, so under
    // hashJoinKeys the string shingle is pruned off every exchange —
    // both distincts and the join shuffle 8-byte longs
    val sh = exploded.select(col("doc_id"), col("split"),
      (if (hashJoinKeys) xxhash64(col("shingle")) else col("shingle")).as("sh"))
    val corpus = sh.filter(col("split") === corpusSplit)
      .select(col("sh")).distinct()
    val probe = sh.filter(col("split") === probeSplit)
      .select(col("doc_id"), col("sh")).distinct()
    probe.join(corpus, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}
