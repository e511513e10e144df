package graft.ops.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Time-series repair specs (the oracled keys carry the cross-engine
  * proof; these pin the SEMANTIC claims a hash match can't diagnose).
  */
class ResampleSpec extends SparkSpec {

  test("q_ts_interpolate: gaps are exactly the planted hours, " +
      "interpolants lie on the neighbour segment, edges stay null") {
    val rows = Resample.qTsInterpolate(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("h"))
      // grid is dense: consecutive hour indices, no holes
      val hs = sorted.map(_.getAs[Long]("h"))
      assert(hs.zip(hs.tail).forall { case (a, b) => b == a + 1 })
      sorted.foreach { r =>
        val h = r.getAs[Long]("h")
        r.getAs[String]("status") match {
          case "observed" =>
            assert(h % 7 != 2 && h % 7 != 3 && !r.isNullAt(r.fieldIndex("cents")))
          case "interpolated" =>
            assert(!r.isNullAt(r.fieldIndex("cents")))
          case "edge" =>
            assert(r.isNullAt(r.fieldIndex("cents")))
        }
      }
      // every interpolated value lies strictly between (or on) its
      // nearest observed neighbours — the segment property
      val obs = sorted.filter(_.getAs[String]("status") == "observed")
        .map(r => r.getAs[Long]("h") -> r.getAs[Double]("cents")).toMap
      val obsHs = obs.keys.toArray.sorted
      sorted.filter(_.getAs[String]("status") == "interpolated").foreach { r =>
        val h = r.getAs[Long]("h")
        val prev = obsHs.filter(_ < h).lastOption
        val next = obsHs.find(_ > h)
        assert(prev.isDefined && next.isDefined, s"interpolated h=$h lacks a neighbour")
        val (pv, nv) = (obs(prev.get), obs(next.get))
        val v = r.getAs[Double]("cents")
        assert(v >= math.min(pv, nv) - 1e-9 && v <= math.max(pv, nv) + 1e-9,
          s"h=$h v=$v outside [$pv, $nv]")
        // exact linear form
        val expect = pv + (nv - pv) * (h - prev.get) / (next.get - prev.get)
        assert(math.abs(v - expect) < 1e-9)
      }
    }
  }

  test("q_ts_backtest: RMSE >= MAE (Cauchy-Schwarz), errors match a " +
      "brute-force recompute") {
    import org.apache.spark.sql.functions._
    val rows = Resample.qTsBacktest(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_evals") >= 1)
      assert(r.getAs[Double]("rmse_naive") >=
        r.getAs[Double]("mae_naive") - 1e-9)
      assert(r.getAs[Double]("mae_drift") >= 0)
    }
    // brute force one type end to end
    val t = rows.head.getAs[String]("event_type")
    val series = graft.Tables.table(spark, sfSmoke, "events")
      .filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      .orderBy("d").collect().map(_.getAs[Long]("c"))
    val errs = series.sliding(3).map(w => math.abs(w(2) - w(1))).toSeq
    // tolerance covers the HALF_UP vs HALF_EVEN 4dp boundary
    val mae = errs.sum.toDouble / errs.length
    assert(math.abs(rows.head.getAs[Double]("mae_naive") - mae) < 1.1e-4,
      s"mae mismatch: ${rows.head.getAs[Double]("mae_naive")} vs $mae")
  }

  test("q_ts_interpolate: all four neighbour windows share ONE exchange") {
    val plan = Resample.qTsInterpolate(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    // exchanges: hourly agg, the grid bounds agg + its broadcast/join,
    // the window sort, final orderBy — but the four window lookups must
    // NOT each add their own hashpartitioning(event_type, h)-free sort
    val windowExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(event_type"))
      .size
    assert(windowExchanges <= 2,
      s"window stage re-shuffled per lookup:\n$plan")
  }
}
