package graft.ops.relational

import graft.SparkSpec

class SubqueriesSpec extends SparkSpec {

  test("correlated EXISTS decorrelates to a semi join (no per-row subquery)") {
    val plan = Subqueries.qSubqueryExists(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("IN-subquery becomes a semi join") {
    val plan = Subqueries.qSubqueryIn(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("pivot emits one column per status with zero-filled gaps") {
    val df = Subqueries.qPivot(spark, sfSmoke)
    assert(df.columns.toSeq === Seq("o_orderpriority", "F", "O", "P"))
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => (1 to 3).forall(i => !r.isNullAt(i))))
  }

  test("unpivot emits 2 rows per part") {
    val n = Subqueries.qUnpivot(spark, sfSmoke).count()
    assert(n === 2 * spark.read.parquet(s"$sfSmoke/part.parquet").count())
  }
}
