package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{AggMaintain, PartitionedUpsert}

/** One continuous query maintains the replica AND its derived
  * aggregate: after every wave (and across a kill-and-resume restart)
  * the maintained aggregate must equal a direct aggregate of the
  * replica's committed state. */
class AggStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("grp", StringType),
    StructField("v", LongType)))

  private def line(pk: Long, lsn: Long, op: String, grp: String, v: Long) =
    s"""{"pk":$pk,"lsn":$lsn,"op":"$op","grp":"$grp","v":$v}"""

  private def aggRows(aggDir: String) =
    AggMaintain.readAggregate(spark, aggDir).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
        r.getAs[Long]("sum_v"))).sortBy(_._1).toSeq

  private def directRows(targetDir: String) = AggMaintain.exposed(
      AggMaintain.fullAggregate(PartitionedUpsert.read(spark, targetDir),
        Seq("grp"), Seq("v")), Seq("grp"), Seq("v"))
    .collect()
    .map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
      r.getAs[Long]("sum_v"))).sortBy(_._1).toSeq

  test("replica + aggregate stay in lockstep across triggers and a " +
      "kill-and-resume restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_aggs").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (tDir, aDir, ckpt) = (s"$base/target", s"$base/agg", s"$base/ckpt")
    def start() = CdcStream.maintainedAggregateSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      tDir, aDir, ckpt, "pk", "lsn", "op", Seq("grp", "v"),
      Seq("grp"), Seq("v"), nBuckets = 4, aggBuckets = 2)
    // wave 1: two triggers — creates groups a and b
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      Seq(line(1, 10, "c", "a", 5), line(2, 11, "c", "a", 7),
        line(3, 12, "c", "b", 9)).mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      Seq(line(1, 20, "u", "a", 6), line(4, 21, "c", "b", 1)).mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill
    assert(aggRows(aDir) === directRows(tDir))
    assert(aggRows(aDir) === Seq(("a", 2L, 13L), ("b", 2L, 10L)))
    // wave 2 after restart: a group move (2: a→b), a delete that
    // shrinks b, and a brand-new group c
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      Seq(line(2, 30, "u", "b", 7), line(3, 31, "d", "b", 0),
        line(5, 32, "c", "c", 2)).mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(aggRows(aDir) === directRows(tDir),
      "restart must not double-apply or lose a maintenance window")
    assert(aggRows(aDir) ===
      Seq(("a", 1L, 6L), ("b", 2L, 8L), ("c", 1L, 2L)))
  }
}
