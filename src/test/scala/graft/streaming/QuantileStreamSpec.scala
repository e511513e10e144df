package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{PartitionedUpsert, QuantileMaintain}
import graft.functions.KllQuantiles

/** The per-group quantile profile rides the stream: first trigger
  * seeds it, later triggers union their windows in, staleness tracks
  * removals, and a kill-and-resume heals — counts exact against the
  * table, ranks in the published band. */
class QuantileStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("grp", StringType),
    StructField("v", LongType)))

  private def line(id: Long, lsn: Long, op: String, grp: String, v: Long) =
    s"""{"id":$id,"lsn":$lsn,"op":"$op","grp":"$grp","v":$v}"""

  test("seed, window unions, staleness, restart heal — counts exact, " +
      "median in band after every wave") {
    val base = java.nio.file.Files.createTempDirectory("graft_qst").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (tDir, qDir, ckpt) = (s"$base/t", s"$base/q", s"$base/ckpt")
    def start() = CdcStream.quantileMaintainedSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      tDir, qDir, ckpt, "id", "lsn", "op", Seq("grp", "v"),
      groupCols = Seq("grp"), quantCol = "v", k = 200, nBuckets = 4,
      qBuckets = 4)
    def prof() = PartitionedUpsert.read(spark, qDir)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Array[Byte]]("sketch"), r.getAs[Long]("n"),
          r.getAs[Long]("stale"))).toMap

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      (0 until 120).map(i =>
        line(i, 100 + i, "c", s"g${i % 2}", i * 3)).mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val p1 = prof()
    assert(p1("g0")._2 === 60L && p1("g0")._3 === 0L)
    assert(KllQuantiles.countOf(p1("g0")._1) === 60L)

    // restart; wave 2 inserts into g1 and deletes 10 g0 rows
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      ((200 until 240).map(i => line(i, 500 + i, "c", "g1", i * 3)) ++
        (0 until 20 by 2).map(i => line(i, 800 + i, "d", "g0", 0)))
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
    // median of the LIVE g1 rows ranks in-band in the sketch
    val m = PartitionedUpsert.read(spark, tDir).filter(col("grp") === "g1")
      .agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(math.abs(KllQuantiles.rankOf(p2("g1")._1, m) - 0.5) < 0.03)
    // cursor current with the table
    assert(PartitionedUpsert.manifestOrFail(spark, qDir)
      .txns(PartitionedUpsert.cdfApp(tDir)) ===
      PartitionedUpsert.manifestOrFail(spark, tDir).version)
  }
}
