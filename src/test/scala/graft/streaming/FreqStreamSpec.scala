package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert
import graft.functions.FreqSketchAgg

/** The per-group frequent-items profile rides the stream: first
  * trigger seeds it, later triggers union their windows in, staleness
  * tracks removals, and a kill-and-resume heals — stream lengths
  * exact against the table, the planted hitter stays ranked first
  * with bounds bracketing its true live count. */
class FreqStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("grp", StringType),
    StructField("item", StringType)))

  private def line(id: Long, lsn: Long, op: String, grp: String,
                   item: String) =
    s"""{"id":$id,"lsn":$lsn,"op":"$op","grp":"$grp","item":"$item"}"""

  test("seed, window unions, staleness, restart heal — lengths exact, " +
      "hitter ranked first after every wave") {
    val base = java.nio.file.Files.createTempDirectory("graft_fst").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (tDir, fDir, ckpt) = (s"$base/t", s"$base/f", s"$base/ckpt")
    def start() = CdcStream.freqMaintainedSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      tDir, fDir, ckpt, "id", "lsn", "op", Seq("grp", "item"),
      groupCols = Seq("grp"), itemCol = "item", maxMapSize = 64,
      nBuckets = 4, fBuckets = 4)
    def prof() = PartitionedUpsert.read(spark, fDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Array[Byte]]("sketch"), r.getAs[Long]("n"),
          r.getAs[Long]("stale"))).toMap
    // 'hot' is 40% of g0's stream; the rest is a long tail
    def item(i: Int): String = if (i % 5 < 2) "hot" else s"t${i % 23}"

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      (0 until 120).map(i =>
        line(i, 100 + i, "c", s"g${i % 2}", item(i))).mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val p1 = prof()
    assert(p1("g0")._2 === 60L && p1("g0")._3 === 0L)
    assert(FreqSketchAgg.streamLength(p1("g0")._1) === 60L)
    assert(FreqSketchAgg.topK(p1("g0")._1, 1).head._1 === "hot")

    // restart; wave 2 inserts into g1 and deletes 10 g0 rows
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      ((200 until 240).map(i => line(i, 500 + i, "c", "g1", item(i))) ++
        (0 until 20 by 2).map(i => line(i, 800 + i, "d", "g0", "x")))
        .mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val p2 = prof()
    assert(p2("g1")._2 === 100L && p2("g1")._3 === 0L)
    assert(p2("g0")._2 === 60L && p2("g0")._3 === 10L,
      "deletes bump stale across the restart boundary")
    // live invariant vs the maintained table itself
    val live = PartitionedUpsert.read(spark, tDir)
      .groupBy(col("grp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p2("g0")._2 - p2("g0")._3 === live("g0"))
    assert(p2("g1")._2 - p2("g1")._3 === live("g1"))
    // the hitter's bounds bracket its true count in the g1 stream
    // (g1 has seen only inserts — stream == live)
    val (top, _, lb, ub) = FreqSketchAgg.topK(p2("g1")._1, 1).head
    assert(top === "hot")
    val trueHot = PartitionedUpsert.read(spark, tDir)
      .filter(col("grp") === "g1" && col("item") === "hot").count()
    assert(lb <= trueHot && trueHot <= ub)
    // cursor current with the table
    assert(PartitionedUpsert.manifestOrFail(spark, fDir)
      .txns(PartitionedUpsert.cdfApp(tDir)) ===
      PartitionedUpsert.manifestOrFail(spark, tDir).version)
  }
}
