package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (§2-K / task brief): image/audio/video
  * as opaque BinaryType payloads with a typed metadata struct.
  *
  * The decode/feature-extract kernels are STUBS — the real codec
  * libraries are not in this container (task brief: "STUB the decode
  * step ... make the Spark-side plumbing real"). Each stub is
  * deterministic (derived from the payload bytes) so the pipeline
  * shape — schema, partitioning, batch processing, dedup — is fully
  * testable; swapping in a real decoder changes only the function
  * body.
  *
  * Scale notes: payloads never pass through a shuffle wider than
  * needed — dedup shuffles (hash, id) pairs, not bytes; decode is a
  * narrow map (no shuffle); `repartitionForDecode` exists to spread
  * heavy decode work evenly (payload-size-aware salting) before the
  * map stage.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Deterministic synthetic media fixture (no codecs in container). */
  def fixture(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val mimes = Seq("image/png", "audio/wav", "video/mp4")
    val rows = (0 until n).map { i =>
      val mime = mimes(rnd.nextInt(mimes.length))
      val payload = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      (i.toLong, payload, mime,
        320 + rnd.nextInt(8) * 160, 240 + rnd.nextInt(8) * 120,
        if (mime == "image/png") 0L else 1000L + rnd.nextInt(60000))
    }
    rows.toDF("media_id", "payload", "mime", "width", "height", "duration_ms")
      .select($"media_id", $"payload",
        struct($"mime", $"width", $"height", $"duration_ms").as("meta"))
  }

  /** STUB decode: derives per-payload statistics deterministically
    * from the bytes (stands in for pixel/sample decoding). */
  val decodeStub: UserDefinedFunction = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else if (payload.isEmpty) (0, 0.0, 0, 0)  // empty is a valid payload
    else {
      val mean = payload.map(_ & 0xFF).sum.toDouble / payload.length
      val mn = payload.map(_ & 0xFF).min
      val mx = payload.map(_ & 0xFF).max
      (payload.length, mean, mn, mx)
    }
  }

  /** STUB feature extraction: 16-dim embedding from byte histogram —
    * a real model would replace the body; the signature (binary →
    * Array[Float]) and distributed shape are what downstream ops use. */
  val featureStub: UserDefinedFunction = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else if (payload.isEmpty) new Array[Float](16)  // zero vector, not NaN/0f
    else {
      val hist = new Array[Float](16)
      payload.foreach(b => hist((b & 0xFF) / 16) += 1.0f)
      val n = payload.length.toFloat
      hist.map(_ / n)
    }
  }

  /** STUB frame sampling: every video row yields `fps` evenly spaced
    * byte-slice "frames" (pos + slice), a generator over media rows. */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    media
      .filter(col("meta.mime") === "video/mp4")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => substring(col("payload"),
            (i * greatest(length(col("payload")) / nFrames, lit(1)) + 1)
              .cast(IntegerType), lit(16))))
          .as(Seq("frame_idx", "frame_bytes")))
  }

  /** Content-hash exact dedup (same keep-min-id pattern as text). */
  def dedupByContent(media: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("media_id").asc)
    media.withColumn("h", sha2(col("payload"), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Spread decode work: repartition by a payload-size-aware salt so
    * heavy payloads don't pile onto few tasks before a decode map. */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions,
      pmod(xxhash64(col("media_id"), length(col("payload"))), lit(partitions)))

  /** Full decode pipeline: decode + features, preserving metadata. */
  def decodePipeline(media: DataFrame): DataFrame =
    media
      .withColumn("decoded", decodeStub(col("payload")))
      .withColumn("features", featureStub(col("payload")))
      .select(col("media_id"), col("meta"),
        col("decoded._1").as("n_bytes"),
        round(col("decoded._2"), 4).as("byte_mean"),
        col("decoded._3").as("byte_min"),
        col("decoded._4").as("byte_max"),
        col("features"))
}
