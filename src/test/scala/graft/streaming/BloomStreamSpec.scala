package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{BloomIndex, PartitionedUpsert}

/** The Bloom-maintained streaming sink: the index must track the
  * table trigger by trigger, a crash between merge and refresh must
  * leave lookups conservative-but-CORRECT (never wrong, never
  * pruning-blind forever), and the restart must heal the index
  * without reprocessing the table. */
class BloomStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lsn", LongType),
    StructField("op", StringType), StructField("user", StringType),
    StructField("cents", LongType)))

  private def line(id: Long, lsn: Long, op: String, user: String,
                   cents: Long) =
    s"""{"id":$id,"lsn":$lsn,"op":"$op","user":"$user","cents":$cents}"""

  private def scanEq(tableDir: String, idxDir: String,
                     values: Seq[Any]): Unit = {
    val viaIdx = BloomIndex
      .lookup(spark, tableDir, idxDir, "user", values)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = PartitionedUpsert.read(spark, tableDir)
      .filter(col("user").isin(values: _*))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaIdx == full)
  }

  test("index tracks the stream; crash between merge and refresh stays " +
      "correct via conservative inclusion and heals on restart") {
    val cvKey = "spark.sql.streaming.stateStore.commitValidation.enabled"
    spark.conf.set(cvKey, "false")
    try {
      val base =
        java.nio.file.Files.createTempDirectory("graft_bloomst").toString
      val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
      val (tDir, iDir, ckpt) = (s"$base/t", s"$base/idx", s"$base/ckpt")
      def start(crash: Boolean = false) =
        CdcStream.bloomMaintainedSinkWithFailpoint(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .json(srcDir),
          tDir, iDir, ckpt, "id", "lsn", "op", Seq("user", "cents"),
          "user", nBuckets = 8, crashAfterMerge = crash)

      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f1.json"),
        (0 until 200).map(i =>
          line(i, 100 + i, "c", s"u${i % 20}", i * 10)).mkString("\n"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val v1 = BloomIndex.indexedVersion(spark, iDir)
      assert(v1.nonEmpty, "first trigger must build the index")
      assert(v1 ==
        PartitionedUpsert.currentManifest(spark, tDir).map(_.version))
      scanEq(tDir, iDir, Seq("u3"))

      // crash between merge and refresh: table moves, index does not
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f2.json"),
        Seq(line(1000, 900, "c", "rare_user", 1L)).mkString("\n"))
      val q2 = start(crash = true)
      try {
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
          q2.awaitTermination(10000L): Unit
          throw q2.exception.getOrElse(fail("failpoint did not fire"))
        }
      } finally q2.stop()
      val tv = PartitionedUpsert.currentManifest(spark, tDir).map(_.version)
      assert(BloomIndex.indexedVersion(spark, iDir) == v1 && tv != v1,
        "table must be ahead of the index after the crash")
      // stale but CORRECT: the new user's bucket rides the manifest diff
      scanEq(tDir, iDir, Seq("rare_user"))
      scanEq(tDir, iDir, Seq("u3"))

      // restart without the failpoint: the replayed batch is a table
      // no-op; the next trigger's refresh heals the index
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f3.json"),
        Seq(line(1001, 901, "c", "u5", 2L)).mkString("\n"))
      val q3 = start()
      try q3.processAllAvailable() finally q3.stop()
      assert(BloomIndex.indexedVersion(spark, iDir) ==
        PartitionedUpsert.currentManifest(spark, tDir).map(_.version),
        "restart must heal the index to the table's version")
      scanEq(tDir, iDir, Seq("rare_user"))
      val cand = BloomIndex.candidateBuckets(
        spark, tDir, iDir, "user", Seq("rare_user"))
      assert(cand.size <= 2,
        s"healed index must prune again, read ${cand.size} buckets")
    } finally spark.conf.unset(cvKey)
  }
}
