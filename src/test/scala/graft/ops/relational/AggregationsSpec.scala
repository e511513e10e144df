package graft.ops.relational

import graft.SparkSpec

class AggregationsSpec extends SparkSpec {
  test("q_agg_basic: one row per (returnflag, linestatus), sorted, >0 groups") {
    val df = Aggregations.qAggBasic(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    assert(keys.sameElements(keys.sorted))
    // count_order sums to full table size
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total === spark.read.parquet(s"$sfSmoke/lineitem.parquet").count())
  }
}
