package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{Cdc, Scd2Maintain}

/** The streaming SCD2 history sink must produce byte-identical history
  * to the batch derivation over the concatenated log — across multiple
  * triggers and a kill-and-resume restart. */
class Scd2StreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("lsn", LongType),
    StructField("ts", LongType), StructField("op", StringType),
    StructField("v", DoubleType)))

  private val events = Seq(
    (1L, 10L, 100L, "c", 1.0), (2L, 11L, 110L, "c", 2.0),
    (1L, 20L, 200L, "u", 1.5), (3L, 21L, 210L, "c", 3.0),
    (2L, 30L, 300L, "u", 2.5), (1L, 31L, 310L, "d", 0.0))

  private def line(e: (Long, Long, Long, String, Double)) =
    s"""{"pk":${e._1},"lsn":${e._2},"ts":${e._3},"op":"${e._4}","v":${e._5}}"""

  private def collectHist(d: org.apache.spark.sql.DataFrame) = d.collect()
    .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("lsn"),
      r.getAs[Long]("ts"), r.getAs[String]("op"), r.getAs[Double]("v"),
      r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to"))
        .map(_.longValue), r.getAs[Boolean]("is_current")))
    .sortBy(t => (t._1, t._2)).toSeq

  test("kill-and-resume: maintained history is byte-identical to the " +
      "batch derivation over the concatenated log") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_scd2s").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (hDir, oDir, ckpt) = (s"$base/hist", s"$base/open", s"$base/ckpt")
    def start() = CdcStream.scd2HistorySink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      hDir, oDir, ckpt, "pk", "lsn", "ts", Seq("op", "v"), nBuckets = 4)
    // wave 1: two files → two triggers, then KILL
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      events.take(2).map(line).mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      events.slice(2, 4).map(line).mkString("\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(collectHist(Scd2Maintain.readHistory(spark, hDir)) ===
      collectHist(Cdc.scd2(events.take(4).toDF("pk", "lsn", "ts", "op", "v"),
        Seq("pk"), "lsn", "ts")))
    // wave 2 after restart from the same checkpoint
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f3.json"),
      events.drop(4).map(line).mkString("\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val maintained = collectHist(Scd2Maintain.readHistory(spark, hDir))
    assert(maintained ===
      collectHist(Cdc.scd2(events.toDF("pk", "lsn", "ts", "op", "v"),
        Seq("pk"), "lsn", "ts")),
      "restart must neither duplicate nor lose version rows")
    assert(maintained.count(_._8) === 3, "one open interval per live key")
  }

  test("chain mode: a crash between the history merges and the chain " +
      "append heals on replay — chain lookups equal the history " +
      "derivation afterwards") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_scd2c").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (hDir, oDir, cDir, ckpt) =
      (s"$base/hist", s"$base/open", s"$base/chain", s"$base/ckpt")
    def start(crash: Boolean) = CdcStream.scd2HistorySinkWithFailpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      hDir, oDir, ckpt, "pk", "lsn", "ts", Seq("op", "v"), nBuckets = 4,
      chainDir = Some(cDir), crashBeforeChain = crash)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      events.take(4).map(line).mkString("\n"))
    // failpoint: history pair committed, chain append never ran
    val q1 = start(crash = true)
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination(10000L): Unit
      }
    } finally q1.stop()
    // replay heals: history merges are txn no-ops, chain completes;
    // the rest of the log flows through both targets
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      events.drop(4).map(line).mkString("\n"))
    val q2 = start(crash = false)
    try q2.processAllAvailable() finally q2.stop()
    // chain lookups must equal the history-window derivation for a
    // probe at every version boundary (the Scd2ChainSpec equality, on
    // the crash-healed streaming-maintained tables)
    val probes = Seq((1L, 1L, 150L), (2L, 1L, 305L), (3L, 1L, 315L),
      (4L, 2L, 500L), (5L, 3L, 250L)).toDF("event_id", "pk", "ts")
    val viaChain = graft.ops.cdc.Scd2Maintain
      .chainAsOf(spark, cDir, probes, "pk", "ts", Seq("op", "v"))
      .select($"event_id", $"dim_v", $"dim_lsn").collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Double](1)).map(_.doubleValue),
        Option(r.getAs[java.lang.Long](2)).map(_.longValue)))
      .sortBy(_._1).toSeq
    val hist = graft.ops.cdc.Scd2Maintain.readHistory(spark, hDir)
      .select($"pk", $"lsn".as("h_lsn"), $"valid_from".as("h_from"),
        $"v".as("h_v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id").orderBy($"h_from".desc, $"h_lsn".desc)
    val viaHist = probes
      .join(hist, probes("pk") === hist("pk") && $"ts" >= $"h_from", "left")
      .drop(hist("pk"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"h_v", $"h_lsn").collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Double](1)).map(_.doubleValue),
        Option(r.getAs[java.lang.Long](2)).map(_.longValue)))
      .sortBy(_._1).toSeq
    assert(viaChain === viaHist,
      "crash-healed chain must answer exactly like the history")
  }
}
