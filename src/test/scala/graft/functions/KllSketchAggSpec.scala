package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The grouped KLL aggregate: per-group blobs carry exact counts,
  * quantiles inside the published rank-error band vs exact
  * percentiles, partition-layout independence (mergeability), null
  * discipline, and interop with the frame-level KllQuantiles tools. */
class KllSketchAggSpec extends SparkSpec {

  test("per-group sketches: exact counts, banded quantiles, layout " +
      "independence, null/all-null discipline, KllQuantiles interop") {
    import spark.implicits._
    KllSketchAgg.register(spark)
    val rnd = new scala.util.Random(5)
    val rows = (1 to 20000).map { i =>
      val g = s"g${i % 3}"
      (g, if (i % 97 == 0) None else Some(rnd.nextGaussian() * 100 + i % 3))
    } ++ (1 to 50).map(_ => ("g_null", Option.empty[Double]))
    val df = rows.map { case (g, v) => (g, v.map(Double.box).orNull) }
      .toDF("g", "v").select($"g", $"v".cast("double").as("v"))
      .repartition(13) // deliberately scrambled layout
    val sk = df.groupBy($"g")
      .agg(KllSketchAgg.kll_agg($"v").as("blob"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Array[Byte]]("blob"))).toMap
    // all-null group yields NULL (the percentile convention)
    assert(sk("g_null").isEmpty)
    // exact counts per group (sketch n is exact by construction)
    val wantCounts = df.filter($"v".isNotNull).groupBy($"g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    wantCounts.foreach { case (g, n) =>
      assert(KllQuantiles.countOf(sk(g).get) === n, s"count drift in $g")
    }
    // quantiles inside the published ~1.65% two-sided rank band
    // (checked generously at 3% of n in RANK space via rankOf)
    val exact = df.filter($"v".isNotNull)
      .groupBy($"g").agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, p50) =>
      val r = KllQuantiles.rankOf(sk(g).get, p50)
      assert(math.abs(r - 0.5) < 0.03,
        s"$g: exact median ranks at $r in the sketch — outside the band")
    }
    // layout independence: a different partitioning merges to a sketch
    // ranking the same probes within the band of the first
    val sk2 = df.repartition(3, $"g").groupBy($"g")
      .agg(KllSketchAgg.kll_agg($"v").as("blob"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Array[Byte]]("blob"))).toMap
    exact.foreach { case (g, p50) =>
      assert(KllQuantiles.countOf(sk2(g).get) === wantCounts(g))
      assert(math.abs(KllQuantiles.rankOf(sk2(g).get, p50) - 0.5) < 0.03)
    }
    // interop: merging the per-group blobs equals one whole-frame
    // sketch in count (merge is the KllQuantiles associative op)
    val merged = Seq("g0", "g1", "g2").map(g => sk(g).get)
      .reduce(KllQuantiles.merge)
    assert(KllQuantiles.countOf(merged) === wantCounts.values.sum)
  }
}
