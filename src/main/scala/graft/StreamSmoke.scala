package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Standalone streaming smoke: drives the CDC file source →
  * foreachBatch upsert sink end-to-end (create → update → tombstone)
  * and prints the final materialized state. No test harness involved —
  * run with `sbt "runMain graft.StreamSmoke"`. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val payload = StructType(Seq(
      StructField("pk", LongType), StructField("val", DoubleType)))
    val base = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    val srcDir = s"$base/changes"
    new java.io.File(srcDir).mkdirs()
    def env(op: String, pk: Long, v: Double, lsn: Long) =
      s"""{"op":"$op","after":{"pk":$pk,"val":$v},"source":{"table":"t","lsn":$lsn},"ts_ms":${1700000000000L + lsn}}"""

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/a.json"),
      Seq(env("c", 1, 1.0, 1), env("c", 2, 2.0, 2)).mkString("\n"))

    val changes = streaming.CdcStream.source(spark, srcDir, payload)
      .select($"after.pk".as("pk"), $"after.val".as("val"), $"op", $"lsn")
    val q = streaming.CdcStream.upsertSink(
      changes, s"$base/tgt", s"$base/ckpt", Seq("pk"), Seq("val"))
    q.processAllAvailable()

    // live append while the query runs: an update + a tombstone
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/b.json"),
      Seq(env("u", 1, 7.5, 3), env("d", 2, 0.0, 4)).mkString("\n"))
    q.processAllAvailable()
    q.stop()

    val state = spark.read.parquet(s"$base/tgt/state")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    println("STREAM_SMOKE_FINAL_STATE: " + state.mkString(", "))
    spark.stop()
  }
}
