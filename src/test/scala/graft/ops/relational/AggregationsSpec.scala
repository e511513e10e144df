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

  test("q_agg_approx_hll: both sketch estimates within 5% of exact") {
    val rows = Aggregations.qAggApproxHll(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      assert(exact > 0, s"exact_parts=$exact")
      assert(r.getAs[Boolean]("approx_within_5pct"), s"approx_count_distinct drifted >5% (exact=$exact)")
      assert(r.getAs[Boolean]("sketch_within_5pct"), s"hll_sketch_estimate drifted >5% (exact=$exact)")
    }
  }

  test("q_agg_approx_quantile: sketch p50/p90 within 2% of exact") {
    // the oracle pins `true` booleans, so >tolerance sketch drift there
    // is an opaque hash mismatch; this is the diagnosable twin
    val rows = Aggregations.qAggApproxQuantile(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("exact_p50"), r.getAs[Double]("exact_p90"))
      assert(p50 > 0 && p90 >= p50, s"degenerate percentiles p50=$p50 p90=$p90")
      assert(r.getAs[Boolean]("p50_within_2pct"), s"percentile_approx p50 drifted >2% (exact=$p50)")
      assert(r.getAs[Boolean]("p90_within_2pct"), s"percentile_approx p90 drifted >2% (exact=$p90)")
    }
  }

  test("weighted_avg UDAF equals the closed-form ratio") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .agg(
        graft.functions.WeightedAvg.weighted_avg($"l_extendedprice", $"l_discount").as("udaf"),
        (sum($"l_extendedprice" * $"l_discount") / sum($"l_discount")).as("ratio"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
  }

  test("weighted_avg UDAF: zero total weight yields NaN, empty-safe") {
    import spark.implicits._
    val z = Seq((1.0, 0.0), (2.0, 0.0)).toDF("v", "w")
      .agg(graft.functions.WeightedAvg.weighted_avg($"v", $"w")).head().getDouble(0)
    assert(z.isNaN)
  }

  test("q_agg_mode: mode is the true max-count value with min-value ties") {
    import org.apache.spark.sql.functions._
    val rows = Aggregations.qAggMode(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val counts = li.filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity")).count()
        .collect().map(x => (x.getDouble(0), x.getLong(1)))
      val maxCnt = counts.map(_._2).max
      val expectMode = counts.filter(_._2 == maxCnt).map(_._1).min
      assert(r.getAs[Double]("mode_qty") === expectMode)
      assert(r.getAs[Long]("mode_cnt") === maxCnt)
      assert(r.getAs[Long]("n_rows") === counts.map(_._2).sum)
      assert(r.getAs[Long]("n_values") === counts.length.toLong)
      val share = r.getAs[Double]("mode_share_4dp")
      assert(share > 0 && share <= 1.0)
    }
  }

  test("q_agg_listagg: joined string is sorted, distinct, and counted") {
    val rows = Aggregations.qAggListagg(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("priorities").split("\\|").toSeq
      assert(parts === parts.sorted, s"not ordered: $parts")
      assert(parts.distinct === parts, s"duplicates: $parts")
      assert(r.getAs[Long]("n_priorities") === parts.length.toLong)
      assert(r.getAs[Long]("n_orders") >= parts.length.toLong)
    }
  }

  test("grouping sets: subtotal levels are internally consistent") {
    val rows = Aggregations.qAggGroupingSets(spark, sfSmoke).collect()
    def g(r: org.apache.spark.sql.Row, c: String): Int = r.getAs[Byte](c).toInt
    val grand = rows.filter(r => g(r, "g_rf") == 1 && g(r, "g_ls") == 1)
    val perFlag = rows.filter(r => g(r, "g_rf") == 0 && g(r, "g_ls") == 1)
    val leaf = rows.filter(r => g(r, "g_rf") == 0 && g(r, "g_ls") == 0)
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === perFlag.map(_.getAs[Long]("n")).sum)
    assert(grand.head.getAs[Long]("n") === leaf.map(_.getAs[Long]("n")).sum)
  }
}
