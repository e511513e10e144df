package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The theta-sketch aggregate: exact-mode set algebra is EXACT (the
  * stated contract), estimation mode stays inside the published
  * 1/sqrt(k) band and is flagged by isExact, grouped aggregation is
  * partition-layout independent, all-null groups yield NULL, and the
  * non-power-of-2 k is rejected at registration. */
class ThetaSketchAggSpec extends SparkSpec {

  test("exact regime: union/intersection/difference cardinalities are " +
      "exactly right; layout independent; all-null -> NULL") {
    import spark.implicits._
    ThetaSketchAgg.register(spark)
    // A = {0..599}, B = {400..999}: |A∩B| = 200, |A∪B| = 1000
    val rows = (0 until 600).map(i => ("a", s"u$i")) ++
      (400 until 1000).map(i => ("b", s"u$i")) ++
      Seq(("c", null.asInstanceOf[String]))
    def sketches(parts: Int) = rows.toDF("grp", "v").repartition(parts)
      .groupBy($"grp")
      .agg(ThetaSketchAgg.theta_agg($"v").as("sk"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Array[Byte]]("sk"))).toMap
    val sk = sketches(7)
    assert(sk("c").isEmpty, "all-null group must yield NULL")
    val (a, b) = (sk("a").get, sk("b").get)
    assert(ThetaSketchAgg.isExact(a) && ThetaSketchAgg.isExact(b))
    assert(math.round(ThetaSketchAgg.estimate(a)) === 600L)
    assert(math.round(ThetaSketchAgg.estimate(
      ThetaSketchAgg.union(a, b))) === 1000L)
    assert(math.round(ThetaSketchAgg.estimate(
      ThetaSketchAgg.intersect(a, b))) === 200L)
    assert(math.round(ThetaSketchAgg.estimate(
      ThetaSketchAgg.aNotB(a, b))) === 400L)
    // partition-layout independence: exact mode retains the same hash
    // set regardless of how partials merged
    val sk1 = sketches(1)
    assert(math.round(ThetaSketchAgg.estimate(sk1("a").get)) === 600L)
    assert(math.round(ThetaSketchAgg.estimate(ThetaSketchAgg.intersect(
      sk1("a").get, sk1("b").get))) === 200L)
  }

  test("estimation regime: forced sampling stays in the published " +
      "band and is flagged; non-power-of-2 k rejected") {
    import spark.implicits._
    ThetaSketchAgg.register(spark)
    // k=16 with 20k distinct items: deep estimation mode. Published
    // relative standard error = 1/sqrt(k) = 25%; assert 4 sigma.
    val n = 20000
    val sk = (0 until n).map(i => s"item$i").toDF("v")
      .agg(ThetaSketchAgg.theta_agg($"v", 16).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(!ThetaSketchAgg.isExact(sk), "20k items at k=16 must sample")
    val est = ThetaSketchAgg.estimate(sk)
    assert(math.abs(est - n) < 4.0 * n / math.sqrt(16.0),
      s"estimate $est outside 4-sigma band around $n")
    intercept[Exception] {
      Seq("x").toDF("v").agg(ThetaSketchAgg.theta_agg($"v", 100).as("s"))
        .collect()
    }
  }
}
