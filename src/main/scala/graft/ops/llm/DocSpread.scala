package graft.ops.llm

import org.apache.spark.sql.DataFrame

/** Spread a small-but-heavy document frame across the cluster before
  * per-row text work (optimization r20, guide §2.5's unsplittable-
  * input case).
  *
  * The bench corpus's documents table is one parquet split, so every
  * tokenize/shingle/regex pass — the map side of each text key's
  * first exchange — ran as ONE task with the rest of the machine idle
  * (profiled: 0.3-0.6 s single-task stages across the llm text
  * family). One round-robin shuffle of the raw docs (500 rows at
  * sf0.1 — noise next to the tokenize) spreads that work across
  * defaultParallelism tasks. Scale posture: at real corpus sizes the
  * reader produces many splits and production drops this hop — the
  * repartition models the decode-spreading the guide's §8 example
  * applies before CPU-bound per-row work, sized to the machine, not
  * hard-coded.
  *
  * Apply to the RAW document frame (before the split()/shingle
  * projection): Catalyst leaves projection evaluation where it is
  * written, so tokenizing above the exchange keeps the heavy work on
  * the spread side, while a projection written below it would stay
  * below. */
object DocSpread {
  def apply(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
