package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the data-mixing
  * machinery of a training pipeline. Everything keys off a PORTABLE
  * content hash of the row id (md5 prefix, PARITY rule 19), never
  * `rand()`: the same row lands in the same sample/split on every run,
  * on every engine, at every scale factor — re-running a 100 TB mix
  * job is reproducible and incremental by construction (new rows get
  * sampled, old rows keep their fate).
  *
  * Scale shape: a narrow projection + filter per row — no shuffle, no
  * driver state, pushdown-friendly.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the row id: salt keeps
    * independent decisions (sample vs split) uncorrelated. md5-prefix
    * (28 bits) so the oracle reproduces it bit-for-bit. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    pmod(conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 7),
      16, 10).cast("long"), lit(buckets.toLong))
  }

  /** Per-stratum keep rate in percent: a row survives iff its hash
    * bucket (0–99) falls below its stratum's rate. Exact in
    * expectation, deterministic in fact — the up/down-sampling knob of
    * a data-mixing config (e.g. downweight a boilerplate-heavy crawl,
    * upweight a rare language). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratesPct: Map[String, Int], defaultPct: Int,
                       salt: String = "sample"): DataFrame = {
    (ratesPct.values.toSeq :+ defaultPct).foreach(r =>
      require(r >= 0 && r <= 100, s"rate must be in [0,100], got $r"))
    val rate = ratesPct.foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.withColumn("sample_bucket", hashBucket(col(idCol), salt, 100))
      .filter(col("sample_bucket") < rate)
  }

  /** Deterministic train/val/test assignment: thresholds are
    * cumulative percents (e.g. 80, 90 → 80% train, 10% val, 10% test).
    * Independent of any sampling decision via its own salt. */
  def assignSplit(id: Column, trainPct: Int, valPct: Int,
                  salt: String = "split"): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"trainPct + valPct must be <= 100, got $trainPct + $valPct")
    val b = hashBucket(id, salt, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
