package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.cdc.{PartitionedUpsert, Scd2Maintain}

/** The streaming point-in-time enrichment sink must equal the batch
  * as-of join of every event against the FULL final history — across
  * triggers, a dim advance between waves, a kill-and-resume restart,
  * and a crash-after-merge failpoint replay. */
class AsofEnrichStreamSpec extends SparkSpec {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("pk", LongType),
    StructField("ts", LongType), StructField("qty", LongType)))

  private def evLine(e: (Long, Long, Long, Long)) =
    s"""{"event_id":${e._1},"pk":${e._2},"ts":${e._3},"qty":${e._4}}"""

  /** Reference: for each event the history version with the greatest
    * (valid_from, lsn) at-or-before the event ts — null dims when no
    * version covers it. */
  private def reference(events: Seq[(Long, Long, Long, Long)],
                        hDir: String) = {
    import spark.implicits._
    val ev = events.toDF("event_id", "pk", "ts", "qty")
    val hist = Scd2Maintain.readHistory(spark, hDir)
      .select($"pk", $"lsn".as("h_lsn"), $"valid_from".as("h_from"),
        $"price".as("h_price"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id").orderBy($"h_from".desc, $"h_lsn".desc)
    ev.join(hist, ev("pk") === hist("pk") && $"ts" >= $"h_from", "left")
      .drop(hist("pk"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"pk", $"ts", $"qty",
        $"h_price".as("dim_price"), $"h_lsn".as("dim_lsn"),
        $"h_from".as("dim_valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Double]("dim_price")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("dim_lsn")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("dim_valid_from")).map(_.longValue)))
      .sortBy(_._1).toSeq
  }

  private def enrichedRows(dir: String) =
    PartitionedUpsert.read(spark, dir)
      .select(col("event_id"), col("pk"), col("ts"), col("qty"),
        col("dim_price"), col("dim_lsn"), col("dim_valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Double]("dim_price")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("dim_lsn")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("dim_valid_from")).map(_.longValue)))
      .sortBy(_._1).toSeq

  test("enriched stream equals the batch as-of join, across a dim " +
      "advance, a restart, and a failpoint replay; late events counted") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_asofe").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (hDir, oDir, eDir, ckpt) =
      (s"$base/hist", s"$base/open", s"$base/enriched", s"$base/ckpt")

    // dim versions, applied in event-time order (the Scd2 contract):
    // pk=1: price 10 from ts=100, 11 from ts=200 | pk=2: 20 from ts=120
    def dimBatch(rows: Seq[(Long, Long, Long, Double)]) =
      Scd2Maintain.applyBatch(spark, hDir, oDir,
        rows.toDF("pk", "lsn", "ts", "price"), "pk", "lsn", "ts",
        Seq("price"), nBuckets = 4)
    Scd2Maintain.init(
      Seq((1L, 1L, 100L, 10.0)).toDF("pk", "lsn", "ts", "price"),
      hDir, oDir, "pk", "lsn", "ts", Seq("price"), nBuckets = 4)
    dimBatch(Seq((1L, 1L, 100L, 10.0), (2L, 2L, 120L, 20.0)))
    dimBatch(Seq((1L, 3L, 200L, 11.0)))

    val late = spark.sparkContext.longAccumulator("late")
    def start(crash: Boolean) = CdcStream.asofEnrichSinkWithFailpoint(
      spark.readStream.schema(evSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      hDir, oDir, eDir, ckpt, keyCol = "pk", eventIdCol = "event_id",
      tsCol = "ts", eventValueCols = Seq("qty"),
      dimValueCols = Seq("price"), nBuckets = 4,
      lateCounter = Some(late), crashAfterMerge = crash)

    // wave 1: current-version hits, a LATE event (ts=150 → v1 of pk=1),
    // a pre-first-version event (ts=50), an unknown key (pk=9)
    val wave1 = Seq((100L, 1L, 250L, 5L), (101L, 1L, 150L, 6L),
      (102L, 2L, 130L, 7L), (103L, 1L, 50L, 8L), (104L, 9L, 500L, 9L))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      wave1.map(evLine).mkString("\n"))
    // failpoint run: merge commits, then the trigger dies
    val q1 = start(crash = true)
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        // processAllAvailable returns on failure too (no data left);
        // awaitTermination surfaces the exception deterministically
        q1.awaitTermination(10000L): Unit
      }
    } finally q1.stop()
    // restart WITHOUT the failpoint: the replayed batch must be a
    // metadata no-op (no duplicate rows, same values)
    val q2 = start(crash = false)
    try q2.processAllAvailable() finally q2.stop()
    assert(enrichedRows(eDir) === reference(wave1, hDir))
    assert(late.value >= 1L, "the ts=150 event must take the late path")

    // dim advances between waves, then wave 2 arrives — including an
    // event now LATE relative to the new open version
    dimBatch(Seq((1L, 4L, 300L, 12.0)))
    val wave2 = Seq((200L, 1L, 350L, 4L), (201L, 1L, 250L, 3L))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f2.json"),
      wave2.map(evLine).mkString("\n"))
    val q3 = start(crash = false)
    try q3.processAllAvailable() finally q3.stop()
    assert(enrichedRows(eDir) === reference(wave1 ++ wave2, hDir),
      "restart + dim advance must neither duplicate nor stale-enrich")
  }

  test("chain mode: with the key-routed version-chain table the late " +
      "path is a point lookup and the enrichment equals the history " +
      "reference bit-for-bit") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_asofc").toString
    val srcDir = s"$base/in"; new java.io.File(srcDir).mkdirs()
    val (hDir, oDir, cDir, eDir, ckpt) = (s"$base/hist", s"$base/open",
      s"$base/chain", s"$base/enriched", s"$base/ckpt")
    def dimBatch(rows: Seq[(Long, Long, Long, Double)]): Unit = {
      val df = rows.toDF("pk", "lsn", "ts", "price")
      Scd2Maintain.applyBatch(spark, hDir, oDir, df, "pk", "lsn", "ts",
        Seq("price"), nBuckets = 4)
      Scd2Maintain.applyBatchChain(spark, cDir, df, "pk", "lsn", "ts",
        Seq("price"), nBuckets = 4): Unit
    }
    val tpl = Seq((1L, 1L, 100L, 10.0)).toDF("pk", "lsn", "ts", "price")
    Scd2Maintain.init(tpl, hDir, oDir, "pk", "lsn", "ts", Seq("price"),
      nBuckets = 4)
    Scd2Maintain.initChain(tpl, cDir, "pk", "lsn", "ts", Seq("price"),
      nBuckets = 4)
    dimBatch(Seq((1L, 1L, 100L, 10.0), (2L, 2L, 120L, 20.0)))
    dimBatch(Seq((1L, 3L, 200L, 11.0)))
    val late = spark.sparkContext.longAccumulator("late_chain")
    val wave = Seq((100L, 1L, 250L, 5L), (101L, 1L, 150L, 6L),
      (102L, 1L, 50L, 7L), (103L, 9L, 500L, 8L))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$srcDir/f1.json"),
      wave.map(evLine).mkString("\n"))
    val q = CdcStream.asofEnrichSink(
      spark.readStream.schema(evSchema).option("maxFilesPerTrigger", 1)
        .json(srcDir),
      hDir, oDir, eDir, ckpt, keyCol = "pk", eventIdCol = "event_id",
      tsCol = "ts", eventValueCols = Seq("qty"),
      dimValueCols = Seq("price"), nBuckets = 4,
      lateCounter = Some(late), chainDir = Some(cDir))
    try q.processAllAvailable() finally q.stop()
    assert(enrichedRows(eDir) === reference(wave, hDir))
    assert(late.value >= 1L, "the ts=150 event must take the (chain) late path")
  }
}
