package graft.ops.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("constraint audit: clean corpus has zero violations everywhere") {
    val rows = Quality.qDqConstraints(spark, sfSmoke).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[Long]("violations") === 0L), rows.mkString(","))
  }

  test("constraint audit catches planted violations") {
    import spark.implicits._
    // orphan lineitem rows: shift half the order keys out of range
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .withColumn("l_orderkey",
        when($"l_linenumber" === 1, $"l_orderkey" + 10000000L).otherwise($"l_orderkey"))
    val orders = spark.read.parquet(s"$sfSmoke/orders.parquet")
    val orphans = li.join(orders, $"l_orderkey" === $"o_orderkey", "left_anti").count()
    assert(orphans > 0)
  }

  test("sessionize: events within a session are gap-bounded; sessions cover all events") {
    import spark.implicits._
    val sessions = Quality.qSessionize(spark, sfSmoke)
    val totalEvents = sessions.agg(sum($"n_events")).head().getLong(0)
    assert(totalEvents === spark.read.parquet(s"$sfSmoke/events.parquet").count())
    // session bounds are ordered and non-overlapping per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_id")
    val overlaps = sessions
      .withColumn("next_start", lead($"session_start", 1).over(w))
      .filter($"next_start".isNotNull &&
        unix_timestamp($"next_start") - unix_timestamp($"session_end") <= 1800)
    assert(overlaps.count() === 0)
  }

  test("activeUsersApprox equals the exact DAU/WAU/MAU series below the HLL coupon regime") {
    // at sf0.001 every trailing window's user cardinality sits inside
    // datasketches HLL's exact (coupon) range for lgK=12, so the
    // sketch series must match the exact series ROW FOR ROW — the
    // NdvMaintainSpec small-cardinality trick. This certifies the blob
    // plumbing (per-day hll_sketch_agg, grid join, hll_union_agg,
    // estimate) with zero approximation tolerance in the assert.
    val exact = Quality.qActiveUsers(spark, sfSmoke).collect()
    val approx = Quality.activeUsersApprox(spark, sfSmoke).collect()
    assert(approx.length === exact.length)
    exact.zip(approx).foreach { case (e, a) =>
      assert(a.getAs[java.sql.Timestamp]("d") === e.getAs[java.sql.Timestamp]("d"))
      assert(a.getAs[Long]("dau") === e.getAs[Long]("dau"), s"dau @ ${e.get(0)}")
      assert(a.getAs[Long]("wau") === e.getAs[Long]("wau"), s"wau @ ${e.get(0)}")
      assert(a.getAs[Long]("mau") === e.getAs[Long]("mau"), s"mau @ ${e.get(0)}")
      assert(a.getAs[Double]("stickiness") === e.getAs[Double]("stickiness"))
    }
    // sanity: the day-blob frame really is bounded by the day count
    val nDays = Quality.activeUsersApprox(spark, sfSmoke).count()
    assert(nDays === exact.length.toLong)
  }

  test("sampling: fraction sample with seed is deterministic; sampleBy stratifies") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfSmoke/orders.parquet")
    val s1 = df.sample(withReplacement = false, 0.1, seed = 42).count()
    val s2 = df.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(s1 === s2 && s1 > 50 && s1 < 300)
    val strat = df.stat.sampleBy("o_orderstatus",
      Map("O" -> 0.5, "F" -> 0.1, "P" -> 1.0), seed = 7)
    val byStatus = strat.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = df.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("P") === totals("P"))                 // fraction 1.0 keeps all
    assert(byStatus("F") < totals("F") / 5)               // ~0.1
  }

  test("id generation: monotonically_increasing_id unique; uuid well-formed") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfSmoke/nation.parquet")
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("uid", expr("uuid()"))
    assert(df.select("mid").distinct().count() === 25)
    assert(df.filter(!$"uid".rlike(
      "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")).count() === 0)
  }
}
