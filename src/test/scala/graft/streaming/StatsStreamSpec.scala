package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{PartitionedUpsert, StatsMaintain}

/** The stats profile rides the stream: per trigger the table merges
  * and the auto-ANALYZE catches up; a kill-and-resume leaves the
  * profile stale-but-honest and the next trigger heals it. */
class StatsStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("amount", LongType),
    StructField("tag", StringType)))

  private def line(id: Long, lsn: Long, op: String, amount: Long, tag: String) =
    s"""{"id":$id,"lsn":$lsn,"op":"$op","amount":$amount,"tag":"$tag"}"""

  test("profile tracks the stream across triggers and a restart; rows " +
      "and bounds match a direct scan after every wave") {
    val base = java.nio.file.Files.createTempDirectory("graft_statsst").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (tDir, sDir, ckpt) = (s"$base/t", s"$base/stats", s"$base/ckpt")
    def start() = CdcStream.statsMaintainedSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      tDir, sDir, ckpt, "id", "lsn", "op", Seq("amount", "tag"),
      nBuckets = 4)

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      (0 until 100).map(i =>
        line(i, 100 + i, "c", i * 2, s"t${i % 7}")).mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val t1 = StatsMaintain.currentStats(spark, sDir).get
    assert(t1.rows === 100L)
    assert(t1.cols("amount").min.contains(0L) &&
      t1.cols("amount").max.contains(198L) && t1.cols("amount").minmaxExact)
    assert(t1.cursor ===
      PartitionedUpsert.manifestOrFail(spark, tDir).version)

    // second wave after a restart: inserts extend the max exactly
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      (100 until 150).map(i =>
        line(i, 300 + i, "c", i * 2, s"t${i % 7}")).mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val t2 = StatsMaintain.currentStats(spark, sDir).get
    assert(t2.rows === 150L &&
      t2.rows === PartitionedUpsert.read(spark, tDir).count())
    assert(t2.cols("amount").max.contains(298L) && t2.cols("amount").minmaxExact)
    val ndv = t2.ndvEstimate(spark, "tag").get
    assert(math.abs(ndv - 7.0) / 7.0 < 0.05, s"ndv $ndv vs exact 7")

    // a delete wave flips honesty flags but stays covering
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(line(149, 500, "d", 0, "")).mkString("\n"))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val t3 = StatsMaintain.currentStats(spark, sDir).get
    assert(t3.rows === 149L)
    assert(t3.cols("amount").max.get >= 296L)
    assert(!t3.cols("amount").minmaxExact,
      "deleting the max row must drop the exactness flag")
    assert(t3.cols("tag").staleDeletes === 1L)
  }
}
