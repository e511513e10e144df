package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming telemetry recorder: per-trigger progress lands as one
  * atomic file per (query, batch), the reader types the core columns,
  * restarts overwrite rather than duplicate, and the rollup matches
  * the recorded rows. */
class OpsMetricsSpec extends SparkSpec {

  test("progress events are recorded per batch, survive restart " +
      "without duplication, and the typed reader/rollup agree") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_om").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (outDir, ckpt, mDir) = (s"$base/out", s"$base/ckpt", s"$base/metrics")
    val schema = StructType(Seq(StructField("pk", LongType),
      StructField("lsn", LongType), StructField("v", DoubleType)))
    val m = OpsMetrics.attach(spark, mDir)
    try {
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(srcDir)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir).start()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f1.json"),
        (1 to 3).map(i => s"""{"pk":$i,"lsn":$i,"v":$i.0}""").mkString("\n"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f2.json"),
        (4 to 5).map(i => s"""{"pk":$i,"lsn":$i,"v":$i.0}""").mkString("\n"))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // allow the async listener bus to drain before reading
      spark.streams.resetTerminated()
      Thread.sleep(1000)
      val t1 = OpsMetrics.table(spark, mDir)
        .filter($"input_rows" > 0)
        .select($"query_id", $"batch_id", $"input_rows", $"batch_ms")
        .collect()
      assert(t1.length === 2, s"two data batches recorded, got ${t1.toSeq}")
      assert(t1.map(_.getLong(2)).sorted.toSeq === Seq(2L, 3L),
        "input_rows must reflect each trigger's file")
      assert(t1.forall(_.getLong(3) >= 0L))
      assert(t1.map(_.getString(0)).distinct.length === 1)
      // restart the SAME query (checkpoint) with one more file: new
      // batches append; nothing from before duplicates (file-per-batch
      // names are stable under the query id)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$srcDir/f3.json"),
        """{"pk":6,"lsn":6,"v":6.0}""")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      Thread.sleep(1000)
      val t2 = OpsMetrics.table(spark, mDir).filter($"input_rows" > 0)
      assert(t2.count() === 3, "restart must append, not duplicate")
      val s = OpsMetrics.summary(spark, mDir)
        .filter($"total_rows" === 6L).collect()
      assert(s.length === 1, "rollup sums the recorded rows")
      assert(s.head.getAs[Long]("n_batches") >= 3L)
    } finally spark.streams.removeListener(m)
  }
}
