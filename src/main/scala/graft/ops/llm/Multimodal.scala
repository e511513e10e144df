package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Oracled multimodal dedup (`q_mm_dedup`): deterministic binary
    * payloads built in-query on BOTH engines (hex template → unhex),
    * exact content dedup over a real BinaryType column with a typed
    * metadata struct. Parity note (probed): DuckDB 1.0's sha256 only
    * accepts VARCHAR — no BLOB overload — so the oracle groups by the
    * payload's HEX encoding, which is bijective with the bytes and
    * therefore the identical partition; the Spark side dedups on
    * sha2(binary, 256) as production would, and content identity is
    * still cross-checked through the hex(payload) roundtrip column
    * (computed FROM the binary on the Spark side). 37 payload
    * families over the corpus → ~13 copies each at sf0.01. */
  def qMmDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("family", $"doc_id" % 37)
      .withColumn("phex", concat(
        md5(concat(lit("blob"), $"family")),
        md5(concat(lit("blob2"), $"family"))))
      .withColumn("payload", unhex($"phex"))
      .withColumn("meta", struct(
        when($"family" % 3 === 0, "image/png")
          .when($"family" % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (lit(160) + ($"family" % 5) * 32).cast(IntegerType).as("width"),
        (lit(120) + ($"family" % 4) * 30).cast(IntegerType).as("height")))
    d.groupBy(sha2($"payload", 256).as("__h"))
      .agg(min($"doc_id").as("keeper_id"),
        count(lit(1)).as("n_copies"),
        min(length($"payload")).as("n_bytes"),
        min(upper(hex($"payload"))).as("payload_hex"),
        min($"meta.mime").as("mime"),
        min($"meta.width").as("width"),
        min($"meta.height").as("height"))
      .drop("__h")
      .orderBy($"keeper_id")
  }

  /** Width/height/format from REAL image container headers (public
    * formats: PNG's IHDR chunk sits at fixed offsets after the 8-byte
    * magic; JPEG's SOF0 segment carries precision/height/width after
    * its FFC0 marker). Catalyst-friendly: the payload's hex transcript
    * is parsed with substring/conv/locate — fully codegen'd, no UDF,
    * and the narrow projection shuffles nothing. Caveats (documented,
    * not hidden): the JPEG branch reads the first BYTE-ALIGNED FFC0
    * pair — the alignment guard (1-based hex offset must be odd) kills
    * the mid-byte alias a metadata segment like 0x1F 0xFC 0x05 would
    * produce, and an unaligned-only match yields NULL dims rather than
    * garbage; only baseline SOF0 is decoded (progressive FFC2 returns
    * format=jpeg with null dims) — a production scanner walks segment
    * lengths, which is a kernel, not an expression. */
  def headerMeta(payload: Column): Column = {
    val h = upper(hex(payload))
    val isPng = substring(h, 1, 16) === "89504E470D0A1A0A"
    val isJpeg = substring(h, 1, 6) === "FFD8FF"
    def hexInt(c: Column): Column = conv(c, 16, 10).cast(IntegerType)
    val sof = locate("FFC0", h)
    val sofOk = sof > 0 && sof % 2 === 1
    val width = when(isPng, hexInt(substring(h, 33, 8)))
      .when(isJpeg && sofOk, hexInt(h.substr(sof + 14, lit(4))))
    val height = when(isPng, hexInt(substring(h, 41, 8)))
      .when(isJpeg && sofOk, hexInt(h.substr(sof + 10, lit(4))))
    struct(
      when(isPng, "png").when(isJpeg, "jpeg").otherwise("unknown")
        .as("format"),
      width.as("width"), height.as("height"))
  }

  /** Oracled header-metadata extraction (`q_mm_meta`): deterministic
    * PNG / JPEG / opaque payloads are built in-query from hex
    * templates with per-family dimensions, roundtripped through
    * unhex → BinaryType, and parsed back by [[headerMeta]] FROM the
    * binary — the hash match proves the offset arithmetic against
    * DuckDB running the identical parse on its own hex transcript. */
  def qMmMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("family", $"doc_id" % 37)
      .withColumn("w", (lit(16) + ($"family" % 5) * 16).cast(IntegerType))
      .withColumn("h", (lit(12) + ($"family" % 4) * 12).cast(IntegerType))
    val phex = when($"family" % 3 === 0, concat(
        lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex($"w"), 8, "0"), lpad(hex($"h"), 8, "0"),
        lit("0806000000"), upper(md5(concat(lit("pngtail"), $"family")))))
      .when($"family" % 3 === 1, concat(
        lit("FFD8FFE000104A46494600010100004800480000FFC0001108"),
        lpad(hex($"h"), 4, "0"), lpad(hex($"w"), 4, "0"),
        lit("03011100021101031101"),
        upper(md5(concat(lit("jpgtail"), $"family")))))
      .otherwise(upper(md5(concat(lit("rawtail"), $"family"))))
    d.withColumn("payload", unhex(phex))
      .withColumn("meta", headerMeta($"payload"))
      .select($"doc_id", $"meta.format".as("format"),
        $"meta.width".as("width"), $"meta.height".as("height"),
        length($"payload").cast(IntegerType).as("n_bytes"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_dedup" -> (qMmDedup _),
    "q_mm_meta" -> (qMmMeta _))

  val oracle: Map[String, String] = Map(
    "q_mm_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 37 AS family,
        |    md5('blob' || (doc_id % 37)) || md5('blob2' || (doc_id % 37)) AS phex
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, family, phex, unhex(phex) AS payload,
        |    CASE family % 3 WHEN 0 THEN 'image/png'
        |                    WHEN 1 THEN 'audio/wav'
        |                    ELSE 'video/mp4' END AS mime,
        |    (160 + (family % 5) * 32)::INT AS width,
        |    (120 + (family % 4) * 30)::INT AS height
        |  FROM d)
        |-- DuckDB 1.0 sha256 has no BLOB overload (probed), so the
        |-- grouping key is the hex encoding — bijective with the bytes,
        |-- identical partition to Spark's sha2(binary) groups
        |SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
        |  min(octet_length(payload))::INT AS n_bytes,
        |  min(upper(hex(payload))) AS payload_hex,
        |  min(mime) AS mime, min(width) AS width, min(height) AS height
        |FROM m GROUP BY phex
        |ORDER BY keeper_id""".stripMargin,
    "q_mm_meta" ->
      """WITH d AS (SELECT doc_id, doc_id % 37 AS family FROM documents),
        |dims AS (
        |  SELECT doc_id, family,
        |    (16 + (family % 5) * 16)::INT AS w,
        |    (12 + (family % 4) * 12)::INT AS h
        |  FROM d),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN family % 3 = 0 THEN
        |      '89504E470D0A1A0A0000000D49484452' || lpad(hex(w), 8, '0') ||
        |      lpad(hex(h), 8, '0') || '0806000000' ||
        |      upper(md5('pngtail' || family))
        |    WHEN family % 3 = 1 THEN
        |      'FFD8FFE000104A46494600010100004800480000FFC0001108' ||
        |      lpad(hex(h), 4, '0') || lpad(hex(w), 4, '0') ||
        |      '03011100021101031101' || upper(md5('jpgtail' || family))
        |    ELSE upper(md5('rawtail' || family)) END AS phex
        |  FROM dims),
        |parsed AS (SELECT doc_id, upper(hex(unhex(phex))) AS hx FROM px)
        |SELECT doc_id,
        |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
        |       WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       ELSE 'unknown' END AS format,
        |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
        |         THEN ('0x' || substr(hx, 33, 8))::BIGINT::INT
        |       WHEN substr(hx, 1, 6) = 'FFD8FF'
        |            AND strpos(hx, 'FFC0') > 0 AND strpos(hx, 'FFC0') % 2 = 1
        |         THEN ('0x' || substr(hx, strpos(hx, 'FFC0') + 14, 4))::BIGINT::INT
        |       END AS width,
        |  CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A'
        |         THEN ('0x' || substr(hx, 41, 8))::BIGINT::INT
        |       WHEN substr(hx, 1, 6) = 'FFD8FF'
        |            AND strpos(hx, 'FFC0') > 0 AND strpos(hx, 'FFC0') % 2 = 1
        |         THEN ('0x' || substr(hx, strpos(hx, 'FFC0') + 10, 4))::BIGINT::INT
        |       END AS height,
        |  (length(hx) // 2)::INT AS n_bytes
        |FROM parsed ORDER BY doc_id""".stripMargin)

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
