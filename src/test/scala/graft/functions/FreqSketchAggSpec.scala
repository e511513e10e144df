package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The grouped frequent-items aggregate: heavy hitters land per group
  * with exact stream lengths, layout independence (mergeability),
  * null discipline, blob interop (merge/topK), and the power-of-2
  * map-size guard. */
class FreqSketchAggSpec extends SparkSpec {

  test("per-group heavy hitters, exact lengths, layout independence, " +
      "nulls, interop merge, map-size guard") {
    import spark.implicits._
    FreqSketchAgg.register(spark)
    val rnd = new scala.util.Random(17)
    // g0/g1: a planted heavy hitter over a long uniform tail (i%10<3
    // lands on 2/5 of g0's even residues and 1/5 of g1's odd ones, so
    // the true counts are 6000 and 3000); g_null: nothing but nulls
    val rows = (1 to 30000).map { i =>
      val g = s"g${i % 2}"
      val item = if (i % 10 < 3) s"HEAVY_$g" else s"t${rnd.nextInt(5000)}"
      (g, item)
    } ++ (1 to 40).map(_ => ("g_null", null: String))
    val df = rows.toDF("g", "item").repartition(11)
    val sk = df.groupBy($"g")
      .agg(FreqSketchAgg.freq_agg($"item", maxMapSize = 256).as("blob"))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Array[Byte]]("blob"))).toMap
    assert(sk("g_null").isEmpty, "all-null group yields NULL")
    Seq("g0", "g1").foreach { g =>
      val blob = sk(g).get
      assert(FreqSketchAgg.streamLength(blob) === 15000L,
        s"$g: stream length must be exact")
      val top = FreqSketchAgg.topK(blob, 1)
      assert(top.head._1 === s"HEAVY_$g",
        s"$g: the planted hitter must rank first, got $top")
      // the bounds bracket the true count (6000 for g0, 3000 for g1)
      val truth = if (g == "g0") 6000L else 3000L
      assert(top.head._3 <= truth && top.head._4 >= truth,
        s"$g: bounds ${top.head} must bracket $truth")
    }
    // layout independence: a different partitioning finds the same
    // heavy hitter with the same exact stream length
    val sk2 = df.repartition(2, $"g").groupBy($"g")
      .agg(FreqSketchAgg.freq_agg($"item", maxMapSize = 256).as("blob"))
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]]("blob")).toMap
    assert(FreqSketchAgg.streamLength(sk2("g0")) === 15000L)
    assert(FreqSketchAgg.topK(sk2("g0"), 1).head._1 === "HEAVY_g0")
    // interop: merging both groups' blobs sums the stream lengths and
    // keeps both hitters in the top-2
    val merged = FreqSketchAgg.merge(sk("g0").get, sk("g1").get)
    assert(FreqSketchAgg.streamLength(merged) === 30000L)
    assert(FreqSketchAgg.topK(merged, 2).map(_._1).toSet ===
      Set("HEAVY_g0", "HEAVY_g1"))
    // map-size contract: non-power-of-2 rejected loudly
    intercept[IllegalArgumentException] {
      df.groupBy($"g").agg(FreqSketchAgg.freq_agg($"item", 100)).collect()
    }
  }
}
