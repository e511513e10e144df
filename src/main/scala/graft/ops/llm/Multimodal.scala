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

  /** WAV (canonical RIFF/PCM 44-byte header) metadata from the binary
    * payload — the audio sibling of [[headerMeta]]. All multi-byte
    * fields are LITTLE-endian, parsed by byte-swapping the hex
    * transcript before the base-16 conversion (the reverse of PNG's
    * big-endian reads). Non-canonical layouts (extra chunks between
    * fmt and data) yield format=unknown rather than garbage — a
    * production scanner walks chunk lengths, which is a kernel, not
    * an expression; this is the honest expression-level boundary,
    * same trade as JPEG's SOF0-only decode. Returns the RAW header
    * fields; derived quantities (sample count, duration) belong to
    * the caller, where integer-DIV semantics are explicit. */
  def wavMeta(payload: Column): Column = {
    val h = upper(hex(payload))
    def le(start: Int, nBytes: Int): Column = conv(concat(
      (0 until nBytes).reverse.map(b => substring(h, start + 2 * b, 2)): _*),
      16, 10).cast(LongType)
    val isWav = length(h) >= 88 &&
      substring(h, 1, 8) === "52494646" &&   // "RIFF"
      substring(h, 17, 8) === "57415645" &&  // "WAVE"
      substring(h, 25, 8) === "666D7420" &&  // "fmt "
      substring(h, 73, 8) === "64617461"     // "data" at the PCM offset
    struct(
      when(isWav, "wav").otherwise("unknown").as("format"),
      when(isWav, le(45, 2)).as("channels"),
      when(isWav, le(49, 4)).as("sample_rate"),
      when(isWav, le(65, 2)).as("block_align"),
      when(isWav, le(69, 2)).as("bits"),
      when(isWav, le(81, 4)).as("data_bytes"))
  }

  /** Oracled audio-header extraction (`q_mm_audio`): canonical WAV
    * payloads with per-family sample rate / channels / bit depth /
    * sample count (plus opaque non-audio payloads) are built in-query
    * from hex templates — every little-endian field byte-swapped into
    * place — roundtripped through unhex → BinaryType, and parsed back
    * by [[wavMeta]] FROM the binary; duration derives via integer DIV
    * on both engines. The hash match proves the LE offset arithmetic
    * cross-engine (the q_mm_meta proof pattern, opposite endianness). */
  def qMmAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def leHex(c: Column, nBytes: Int): Column = {
      val be = lpad(hex(c), 2 * nBytes, "0")
      concat((0 until nBytes).map(b => substring(be, 2 * b + 1, 2)).reverse: _*)
    }
    val d = graft.Tables.table(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("family", $"doc_id" % 23)
      .withColumn("rate",
        when($"family" % 5 === 0, 8000L).when($"family" % 5 === 1, 16000L)
          .when($"family" % 5 === 2, 22050L).when($"family" % 5 === 3, 44100L)
          .otherwise(48000L))
      .withColumn("ch", lit(1L) + $"family" % 2)
      .withColumn("bits",
        when($"family" % 3 === 0, 8L).when($"family" % 3 === 1, 16L)
          .otherwise(32L))
      .withColumn("nsamp", lit(1000L) + $"family" * 977L)
      .withColumn("align", expr("ch * bits DIV 8"))
      .withColumn("dsz", $"nsamp" * $"align")
      .withColumn("brate", $"rate" * $"align")
    val phex = when($"family" % 4 === 3,
        upper(md5(concat(lit("opaque"), $"family"))))
      .otherwise(concat(
        lit("52494646"), lit("00000000"), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"),
        leHex($"ch", 2), leHex($"rate", 4), leHex($"brate", 4),
        leHex($"align", 2), leHex($"bits", 2),
        lit("64617461"), leHex($"dsz", 4),
        upper(md5(concat(lit("wavtail"), $"family")))))
    d.withColumn("payload", unhex(phex))
      .withColumn("meta", wavMeta($"payload"))
      .select($"doc_id", $"meta.format".as("format"),
        $"meta.channels".as("channels"),
        $"meta.sample_rate".as("sample_rate"), $"meta.bits".as("bits"),
        expr("meta.data_bytes DIV meta.block_align").as("n_samples"),
        expr("(meta.data_bytes DIV meta.block_align) * 1000 " +
          "DIV meta.sample_rate").as("duration_ms"))
      .orderBy($"doc_id")
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

  /** GIF logical-screen metadata from the binary payload — LE uint16
    * dims like WAV (byte-swapped hex reads), version split 87a/89a,
    * plus the packed flags byte: global-color-table presence and its
    * 2^(n+1) entry count via an exact shift (no float pow). Truncated
    * payloads (< 13 header bytes) yield format=unknown — the wavMeta
    * honesty rule. */
  def gifMeta(payload: Column): Column = {
    val h = upper(hex(payload))
    def le16(start: Int): Column = conv(
      concat(substring(h, start + 2, 2), substring(h, start, 2)),
      16, 10).cast(IntegerType)
    val is87 = substring(h, 1, 12) === "474946383761"
    val is89 = substring(h, 1, 12) === "474946383961"
    val isGif = (is87 || is89) && length(h) >= 26
    val packed = conv(substring(h, 21, 2), 16, 10).cast(IntegerType)
    val gctFlag = (packed.cast(IntegerType) / 128).cast(IntegerType) % 2
    struct(
      when(isGif && is87, "gif87a").when(isGif && is89, "gif89a")
        .otherwise("unknown").as("format"),
      when(isGif, le16(13)).as("width"),
      when(isGif, le16(17)).as("height"),
      when(isGif, gctFlag === 1).as("has_gct"),
      when(isGif && gctFlag === 1,
        // 2^(size+1) entries via an exact lookup (the Scala shiftleft
        // API takes only a literal bit count)
        element_at(array((1 to 8).map(i => lit(1 << i)): _*),
          pmod(packed, lit(8)) + 1)).as("gct_entries"))
  }

  /** Oracled GIF-header extraction (`q_mm_gif`): 87a/89a variants
    * with and without a global color table, plus opaque payloads,
    * built in-query from hex templates (LE dims byte-swapped into
    * place) and parsed back FROM the binary by [[gifMeta]] — the
    * q_mm_meta proof pattern on the little-endian image branch. */
  def qMmGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("family", $"doc_id" % 23)
      .withColumn("w", (lit(20) + ($"family" % 6) * 10).cast(IntegerType))
      .withColumn("h", (lit(15) + ($"family" % 5) * 10).cast(IntegerType))
    def le16(c: Column): Column = {
      val be = lpad(hex(c), 4, "0")
      concat(substring(be, 3, 2), substring(be, 1, 2))
    }
    // packed byte: GCT flag set for family%4==0 with size bits
    // family%8; clear otherwise (color resolution bits 0 — canonical)
    val packed = when($"family" % 4 === 0,
        lpad(hex(lit(128) + pmod($"family", lit(8))), 2, "0"))
      .otherwise(lit("00"))
    val phex = when($"family" % 3 === 0, concat(
        lit("474946383961"), le16($"w"), le16($"h"), packed, lit("0000"),
        upper(md5(concat(lit("g89"), $"family")))))
      .when($"family" % 3 === 1, concat(
        lit("474946383761"), le16($"w"), le16($"h"), packed, lit("0000"),
        upper(md5(concat(lit("g87"), $"family")))))
      .otherwise(upper(md5(concat(lit("gifraw"), $"family"))))
    d.withColumn("payload", unhex(phex))
      .withColumn("meta", gifMeta($"payload"))
      .select($"doc_id", $"meta.format".as("format"),
        $"meta.width".as("width"), $"meta.height".as("height"),
        $"meta.has_gct".as("has_gct"),
        $"meta.gct_entries".as("gct_entries"),
        length($"payload").cast(IntegerType).as("n_bytes"))
      .orderBy($"doc_id")
  }

  /** MP4 (ISO-BMFF) header metadata from the binary payload — the
    * video sibling of [[headerMeta]]/[[wavMeta]], completing the
    * image/audio/video modality triple. BIG-endian box fields (like
    * PNG, unlike WAV): validates 'ftyp' at byte 4, reads the ftyp box
    * size to find the next box, and extracts movie timescale/duration
    * from an mvhd v0 immediately inside a following 'moov'. A
    * non-faststart file (mdat before moov) yields format/brand with
    * NULL timing rather than garbage — walking arbitrary box chains
    * is a kernel's job, not an expression's (the wavMeta honest
    * boundary, stated there for chunk walks). */
  def mp4Meta(payload: Column): Column = {
    val h = upper(hex(payload))
    def hexLong(c: Column): Column = conv(c, 16, 10).cast(LongType)
    val isMp4 = length(h) >= 64 && substring(h, 9, 8) === "66747970"
    val fsz = hexLong(substring(h, 1, 8)) // ftyp box size, bytes
    def at(byteOff: Column, nBytes: Int): Column =
      h.substr(byteOff * 2 + 1, lit(2 * nBytes))
    val moovOk = isMp4 && at(fsz + 4, 4) === "6D6F6F76" &&
      at(fsz + 12, 4) === "6D766864" && at(fsz + 16, 4) === "00000000"
    val brandHex = substring(h, 17, 8)
    struct(
      when(isMp4, "mp4").otherwise("unknown").as("format"),
      when(isMp4,
        when(brandHex === "69736F6D", "isom")
          .when(brandHex === "6D703432", "mp42")
          .when(brandHex === "61766331", "avc1")
          .otherwise("other")).as("brand"),
      when(moovOk, hexLong(at(fsz + 28, 4))).as("timescale"),
      when(moovOk, hexLong(at(fsz + 32, 4))).as("duration_units"))
  }

  /** Oracled video-header extraction (`q_mm_video`): canonical
    * faststart MP4s, non-faststart (mdat-first) variants, and opaque
    * payloads are built in-query from hex templates — big-endian box
    * sizes and mvhd fields lpad-hexed into place — roundtripped
    * through unhex → BinaryType, and parsed back by [[mp4Meta]] FROM
    * the binary, the box offsets recomputed from the ftyp size, not
    * assumed. The hash match proves the dynamic-offset arithmetic
    * cross-engine (the q_mm_meta proof pattern, plus runtime offsets). */
  def qMmVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("family", $"doc_id" % 29)
      .withColumn("brand",
        when($"family" % 3 === 0, "69736F6D")
          .when($"family" % 3 === 1, "6D703432")
          .otherwise("61766331"))
      .withColumn("ts",
        when($"family" % 4 === 0, 600L).when($"family" % 4 === 1, 1000L)
          .when($"family" % 4 === 2, 90000L).otherwise(48000L))
      .withColumn("dur", lit(1000L) + $"family" * 977L)
    val ftyp = concat(lit("00000014"), lit("66747970"), $"brand",
      lit("00000200"), lit("6D703431"))
    val mvhd = concat(lit("0000006C"), lit("6D766864"), lit("00000000"),
      lit("00000000"), lit("00000000"),
      lpad(hex($"ts"), 8, "0"), lpad(hex($"dur"), 8, "0"))
    val moov = concat(lit("00000074"), lit("6D6F6F76"), mvhd)
    val phex = when($"family" % 5 === 4,
        upper(md5(concat(lit("vopaque"), $"family"))))
      .when($"family" % 7 === 5, concat(ftyp,
        lit("00000018"), lit("6D646174"),
        upper(md5(concat(lit("mdat"), $"family"))),
        moov))
      .otherwise(concat(ftyp, moov,
        upper(md5(concat(lit("vtail"), $"family")))))
    d.withColumn("payload", unhex(phex))
      .withColumn("meta", mp4Meta($"payload"))
      .select($"doc_id", $"meta.format".as("format"),
        $"meta.brand".as("brand"), $"meta.timescale".as("timescale"),
        $"meta.duration_units".as("duration_units"),
        expr("meta.duration_units * 1000 DIV meta.timescale")
          .as("duration_ms"))
      .orderBy($"doc_id")
  }

  /** 56-bit dHash (difference hash) over a raw grayscale payload —
    * the PERCEPTUAL rung of the multimodal dedup ladder: exact
    * content-hash dedup (q_mm_dedup) catches bit-identical copies
    * only, which at 100 TB of re-encoded/watermarked crawl images is
    * almost nothing; dHash fingerprints the LUMINANCE GRADIENT
    * (bit(r,c) = pixel(r,c) < pixel(r,c+1) over a 9×7 thumbnail), so
    * small perturbations flip few bits and near-dups land within a
    * small hamming distance — the published perceptual-hash family
    * (pHash/dHash), gradient flavor.
    *
    * Payload container: `IMGG` magic + w + h + w×h grayscale bytes —
    * the deterministic uncompressed thumbnail a real pipeline would
    * produce with its decoder kernel (the decodeStub boundary: codecs
    * are a kernel's job; the hash over decoded pixels is exactly this
    * expression). Fixed 9×7 geometry = 56 comparison bits, deliberately
    * NOT 64: bit 63 would shift into the sign across engines.
    * Computed by the NATIVE codegen kernel (graft_img_dhash,
    * optimization r20 — the graft_dot precedent): the hex-transcript
    * fold below ([[dHashHexReference]]) reads every pixel through a
    * substring+conv subtree over a 2×-size hex string (~240
    * string-slicing nodes per row) and dominated q_mm_neardup's
    * per-rep wall; the kernel computes the identical bits straight
    * off the payload bytes. MediaHashSpec pins kernel ≡ transcript
    * row-for-row, and the DuckDB oracle still replays the transcript
    * SQL, so the gate re-certifies the equality on every run. Non-IMGG
    * or truncated payloads yield NULL (the wavMeta honesty rule). */
  def dHash(payload: Column): Column =
    graft.functions.MediaHash.img_dhash(payload)

  /** The pure-Catalyst hex-transcript fold dHash originally shipped —
    * kept as the cross-engine REFERENCE (it is literally the oracle's
    * SQL, expression for expression) that MediaHashSpec pins the
    * native kernel against. Not on any query path. */
  private[graft] def dHashHexReference(payload: Column): Column = {
    val hx = upper(hex(payload))
    val ok = substring(hx, 1, 8) === "494D4747" &&
      substring(hx, 9, 4) === "0907" && length(hx) >= lit(138)
    def px(k: Int): Column =
      conv(substring(hx, 13 + 2 * k, 2), 16, 10).cast(IntegerType)
    val fp = (0 until 56).map { b =>
      val r = b / 8; val c = b % 8
      when(px(r * 9 + c) < px(r * 9 + c + 1), shiftleft(lit(1L), b))
        .otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    when(ok, fp)
  }

  /** Perceptual near-dup pairs by banded hamming buckets — NEVER
    * all-pairs: the 56-bit fingerprint splits into 4 × 14-bit bands;
    * by pigeonhole a pair within hamming distance 3 agrees on ≥1 whole
    * band, so the band-bucket self-join (one shuffle on (band, bh))
    * generates every true candidate and the exact bit_count(xor)
    * verify prunes the rest — the SimHash banding machinery
    * (NearDup.simHashNearDups) applied to the image modality. Skewed
    * buckets (flat/black thumbnails collapsing to fp=0) are the same
    * mega-bucket hazard as text boilerplate: run exact dedup first,
    * and cap survivors via AQE skew handling. Rows with NULL fp
    * (non-image payloads) never enter the join. */
  /** Banded-hamming candidate pairs over a (doc_id, fp) frame — the
    * shared bucket-join core of the perceptual near-dup family
    * ([[dHashNearDups]] for images, [[wavEnvelopeNearDups]] for
    * audio). `bands` = (shift, width) slices covering the fingerprint;
    * by pigeonhole a pair within hamming distance (bands−1) agrees on
    * ≥1 whole band — one shuffle on (band, bh), NEVER all-pairs. */
  private[llm] def bandedHammingPairs(fp: DataFrame,
      bands: Seq[(Int, Int)], maxDistance: Int): DataFrame = {
    val banded = fp.select(col("doc_id"), col("fp"),
      explode(array(bands.zipWithIndex.map { case ((shift, width), i) =>
        struct(lit(i).as("band"),
          shiftright(col("fp"), shift)
            .bitwiseAND((1L << width) - 1L).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.band").as("band"),
        col("bb.bh").as("bh"))
    val a = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_a"), col("fp").as("fa"))
    val b = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_b"), col("fp").as("fb"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }

  def dHashNearDups(media: DataFrame, idCol: String,
                    maxDistance: Int = 3): DataFrame = {
    // materialized: one long per image. Both join sides consume the
    // fingerprint frame, and Catalyst would otherwise inline the
    // 56-comparison fold (with its hex transcript subtrees) into EACH
    // side of the self-join — the graph-family localCheckpoint
    // discipline (lineage truncated; Bench GCs blocks between keys,
    // long-lived callers unpersist via the returned plan's lifecycle)
    val fp = media.select(col(idCol).as("doc_id"),
      dHash(col("payload")).as("fp")).filter(col("fp").isNotNull)
      .localCheckpoint()
    bandedHammingPairs(fp,
      Seq((0, 14), (14, 14), (28, 14), (42, 14)), maxDistance)
  }

  /** Oracled perceptual near-dup (`q_mm_neardup`): deterministic 9×7
    * grayscale thumbnails built in-query per doc (md5-chain pixels in
    * the IMGG container), with PLANTED PERTURBED TWINS — every doc_id
    * ≡ 1 (mod 20) reuses its predecessor's pixels with three
    * start-of-row pixels overwritten, flipping at most 3 of the 56
    * dHash bits (each row-start pixel feeds exactly one comparison) —
    * so the twins land within the hamming-3 margin by construction
    * while organic pairs sit near the 28-bit expectation. The oracle
    * rebuilds identical thumbnails, folds the same 56 comparisons
    * (bit_or of shifts — BIGINT-exact), bands, joins, and verifies —
    * proving fingerprint arithmetic, banding, and the candidate
    * pipeline cross-engine. */
  def qMmNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents").select($"doc_id")
      .withColumn("is_twin", $"doc_id" % 20 === 1)
      .withColumn("base_id", when($"is_twin", $"doc_id" - 1)
        .otherwise($"doc_id"))
    val pix = substring(concat((0 until 4).map(i =>
      md5(concat(lit(s"img$i:"), $"base_id"))): _*), 1, 126)
    // twin: pixels 0/9/18 (row starts; hex chars 1-2/19-20/37-38) → 00
    val pixTwin = concat(lit("00"), substring(pix, 3, 16),
      lit("00"), substring(pix, 21, 16),
      lit("00"), substring(pix, 39, 88))
    val media = d.withColumn("payload",
      unhex(concat(lit("494D47470907"),
        upper(when($"is_twin", pixTwin).otherwise(pix)))))
    dHashNearDups(media, "doc_id", maxDistance = 3)
      .orderBy($"doc_a", $"doc_b")
  }

  /** 31-bit energy-envelope gradient hash over 8-bit mono PCM — the
    * AUDIO rung of the perceptual dedup ladder (acoustic-fingerprint
    * family: the published systems hash a spectral envelope; the
    * expression-level boundary here is the TIME-domain energy envelope
    * — 32 frames of 2 samples, per-frame energy = Σ|s−128|, bit(i) =
    * e(i) < e(i+1) — with the spectral transform being a decode
    * kernel's job, exactly the decodeStub boundary). Re-encoded or
    * slightly-edited audio preserves the loudness CONTOUR, so near
    * copies land within a small hamming distance while exact hashing
    * catches nothing. Requires the canonical 44-byte WAV header
    * ([[wavMeta]]'s layout) with ≥64 PCM bytes; anything else is NULL.
    * Computed by the NATIVE codegen kernel (graft_wav_envhash — the
    * dHash rationale); [[wavEnvelopeHexReference]] is the pinned
    * cross-engine transcript. */
  def wavEnvelopeHash(payload: Column): Column =
    graft.functions.MediaHash.wav_envhash(payload)

  /** The original pure-Catalyst transcript — the oracle's SQL form,
    * pinned against the native kernel by MediaHashSpec. Not on any
    * query path. */
  private[graft] def wavEnvelopeHexReference(payload: Column): Column = {
    val hx = upper(hex(payload))
    val ok = substring(hx, 1, 8) === "52494646" &&
      substring(hx, 17, 8) === "57415645" &&
      substring(hx, 73, 8) === "64617461" && length(hx) >= lit(88 + 128)
    def px(k: Int): Column =
      conv(substring(hx, 89 + 2 * k, 2), 16, 10).cast(IntegerType)
    def energy(f: Int): Column =
      abs(px(2 * f) - 128) + abs(px(2 * f + 1) - 128)
    val fp = (0 until 31).map { b =>
      when(energy(b) < energy(b + 1), shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    when(ok, fp)
  }

  /** Audio perceptual near-dup pairs: [[wavEnvelopeHash]] banded into
    * 3 slices (10+10+11 bits) — pigeonhole covers hamming ≤ 2 — and
    * verified exactly. Same bucket-join core as the image rung. */
  def wavEnvelopeNearDups(media: DataFrame, idCol: String,
                          maxDistance: Int = 2): DataFrame = {
    val fp = media.select(col(idCol).as("doc_id"),
      wavEnvelopeHash(col("payload")).as("fp")).filter(col("fp").isNotNull)
      .localCheckpoint()
    bandedHammingPairs(fp, Seq((0, 10), (10, 10), (20, 11)), maxDistance)
  }

  /** Oracled audio perceptual near-dup (`q_mm_audio_neardup`):
    * deterministic 64-sample 8-bit mono WAVs built in-query (the
    * q_mm_audio container template, PCM bytes from md5 chains), with
    * PLANTED PERTURBED TWINS — every doc_id ≡ 1 (mod 20) reuses its
    * predecessor's PCM with the two EDGE frames' samples overwritten
    * (frames 0 and 31 each feed exactly one envelope comparison, so at
    * most 2 of the 31 bits flip — inside the hamming-2 margin by
    * construction) while organic pairs sit near the 15-bit
    * expectation. The oracle rebuilds identical WAVs, folds the same
    * 31 envelope comparisons (bit_or of shifts), bands, joins, and
    * verifies. */
  def qMmAudioNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = graft.Tables.table(spark, dir, "documents").select($"doc_id")
      .withColumn("is_twin", $"doc_id" % 20 === 1)
      .withColumn("base_id", when($"is_twin", $"doc_id" - 1)
        .otherwise($"doc_id"))
    // 64 PCM bytes = 128 hex chars from four md5 chains
    val pcm = concat((0 until 4).map(i =>
      md5(concat(lit(s"pcm$i:"), $"base_id"))): _*)
    // twin: samples 0-1 (frame 0) and 62-63 (frame 31) pinned to
    // extremes — each edge frame feeds exactly one comparison bit
    val pcmTwin = concat(lit("FF00"), substring(pcm, 5, 120), lit("00FF"))
    val header = concat(
      lit("52494646"), lit("00000000"), lit("57415645"),
      lit("666D7420"), lit("10000000"), lit("0100"), lit("0100"),
      lit("401F0000"), lit("401F0000"), lit("0100"), lit("0800"),
      lit("64617461"), lit("40000000"))
    val media = d.withColumn("payload",
      unhex(concat(header, upper(when($"is_twin", pcmTwin).otherwise(pcm)))))
    wavEnvelopeNearDups(media, "doc_id", maxDistance = 2)
      .orderBy($"doc_a", $"doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_audio_neardup" -> (qMmAudioNeardup _),
    "q_mm_neardup" -> (qMmNeardup _),
    "q_mm_video" -> (qMmVideo _),
    "q_mm_dedup" -> (qMmDedup _),
    "q_mm_meta" -> (qMmMeta _),
    "q_mm_gif" -> (qMmGif _),
    "q_mm_audio" -> (qMmAudio _))

  val oracle: Map[String, String] = Map(
    // identical WAVs, the same 31 envelope comparisons (|s−128| energy
    // over 2-sample frames), the same 10/10/11 banding and verify
    "q_mm_audio_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 20 = 1) AS is_twin,
        |    CASE WHEN doc_id % 20 = 1 THEN doc_id - 1 ELSE doc_id END AS base_id
        |  FROM documents),
        |px0 AS (
        |  SELECT doc_id, is_twin,
        |    md5('pcm0:' || base_id) || md5('pcm1:' || base_id) ||
        |    md5('pcm2:' || base_id) || md5('pcm3:' || base_id) AS pcm
        |  FROM d),
        |pay AS (
        |  SELECT doc_id,
        |    '524946460000000057415645666D74201000000001000100' ||
        |    '401F0000401F00000100080064617461' || '40000000' ||
        |    upper(CASE WHEN is_twin
        |      THEN 'FF00' || substr(pcm, 5, 120) || '00FF'
        |      ELSE pcm END) AS phex
        |  FROM px0),
        |parsed AS (SELECT doc_id, upper(hex(unhex(phex))) AS hx FROM pay),
        |fps AS (
        |  SELECT doc_id, bit_or(CASE WHEN
        |      (abs(('0x' || substr(hx, 89 + 4*b, 2))::BIGINT - 128) +
        |       abs(('0x' || substr(hx, 91 + 4*b, 2))::BIGINT - 128)) <
        |      (abs(('0x' || substr(hx, 93 + 4*b, 2))::BIGINT - 128) +
        |       abs(('0x' || substr(hx, 95 + 4*b, 2))::BIGINT - 128))
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS fp
        |  FROM parsed, range(0, 31) t(b)
        |  WHERE substr(hx, 1, 8) = '52494646'
        |    AND substr(hx, 17, 8) = '57415645'
        |    AND substr(hx, 73, 8) = '64617461' AND length(hx) >= 216
        |  GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, fp, i AS band,
        |    (fp >> (CASE i WHEN 0 THEN 0 WHEN 1 THEN 10 ELSE 20 END)) &
        |    (CASE i WHEN 2 THEN 2047 ELSE 1023 END) AS bh
        |  FROM fps, range(0, 3) t(i)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    bit_count(xor(x.fp, y.fp))::INT AS distance
        |  FROM banded x JOIN banded y
        |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b, distance FROM cand WHERE distance <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // identical thumbnails, the same 56-comparison fold (bit_or of
    // shifts — BIGINT-exact, no HUGEINT sum), the same 4×14-bit
    // banding and hamming verify — the full candidate pipeline
    // cross-engine
    "q_mm_neardup" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 20 = 1) AS is_twin,
        |    CASE WHEN doc_id % 20 = 1 THEN doc_id - 1 ELSE doc_id END AS base_id
        |  FROM documents),
        |pxs AS (
        |  SELECT doc_id, is_twin,
        |    substr(md5('img0:' || base_id) || md5('img1:' || base_id) ||
        |           md5('img2:' || base_id) || md5('img3:' || base_id),
        |           1, 126) AS pix
        |  FROM d),
        |payloads AS (
        |  SELECT doc_id,
        |    '494D47470907' || upper(CASE WHEN is_twin THEN
        |      '00' || substr(pix, 3, 16) || '00' || substr(pix, 21, 16) ||
        |      '00' || substr(pix, 39, 88)
        |    ELSE pix END) AS phex
        |  FROM pxs),
        |parsed AS (SELECT doc_id, upper(hex(unhex(phex))) AS hx FROM payloads),
        |fps AS (
        |  SELECT doc_id, bit_or(CASE WHEN
        |      ('0x' || substr(hx, 13 + 2*((b//8)*9 + b%8), 2))::BIGINT <
        |      ('0x' || substr(hx, 13 + 2*((b//8)*9 + b%8 + 1), 2))::BIGINT
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS fp
        |  FROM parsed, range(0, 56) t(b)
        |  WHERE substr(hx, 1, 8) = '494D4747' AND substr(hx, 9, 4) = '0907'
        |    AND length(hx) >= 138
        |  GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, fp, i AS band, (fp >> (14*i)) & 16383 AS bh
        |  FROM fps, range(0, 4) t(i)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    bit_count(xor(x.fp, y.fp))::INT AS distance
        |  FROM banded x JOIN banded y
        |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b, distance FROM cand WHERE distance <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // same hex templates; LE dims re-read by byte swap FROM the
    // roundtripped binary; gct entries via an exact shift
    "q_mm_gif" ->
      """WITH d AS (SELECT doc_id, doc_id % 23 AS family FROM documents),
        |dims AS (
        |  SELECT doc_id, family,
        |    (20 + (family % 6) * 10)::INT AS w,
        |    (15 + (family % 5) * 10)::INT AS h,
        |    CASE WHEN family % 4 = 0
        |         THEN lpad(hex(128 + family % 8), 2, '0')
        |         ELSE '00' END AS packed
        |  FROM d),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN family % 3 = 0 THEN
        |      '474946383961' ||
        |      substr(lpad(hex(w), 4, '0'), 3, 2) || substr(lpad(hex(w), 4, '0'), 1, 2) ||
        |      substr(lpad(hex(h), 4, '0'), 3, 2) || substr(lpad(hex(h), 4, '0'), 1, 2) ||
        |      packed || '0000' || upper(md5('g89' || family))
        |    WHEN family % 3 = 1 THEN
        |      '474946383761' ||
        |      substr(lpad(hex(w), 4, '0'), 3, 2) || substr(lpad(hex(w), 4, '0'), 1, 2) ||
        |      substr(lpad(hex(h), 4, '0'), 3, 2) || substr(lpad(hex(h), 4, '0'), 1, 2) ||
        |      packed || '0000' || upper(md5('g87' || family))
        |    ELSE upper(md5('gifraw' || family)) END AS phex
        |  FROM dims),
        |parsed AS (
        |  SELECT doc_id, upper(hex(unhex(phex))) AS hx,
        |    octet_length(unhex(phex))::INT AS n_bytes
        |  FROM px),
        |f AS (
        |  SELECT doc_id, hx, n_bytes,
        |    (substr(hx, 1, 12) = '474946383761') AS is87,
        |    (substr(hx, 1, 12) = '474946383961') AS is89,
        |    ('0x' || substr(hx, 21, 2))::INT AS packed
        |  FROM parsed),
        |g AS (
        |  SELECT *, ((is87 OR is89) AND length(hx) >= 26) AS isgif,
        |    (packed // 128) % 2 AS gct
        |  FROM f)
        |SELECT doc_id,
        |  CASE WHEN isgif AND is87 THEN 'gif87a'
        |       WHEN isgif AND is89 THEN 'gif89a'
        |       ELSE 'unknown' END AS format,
        |  CASE WHEN isgif THEN
        |    ('0x' || substr(hx, 15, 2) || substr(hx, 13, 2))::INT END AS width,
        |  CASE WHEN isgif THEN
        |    ('0x' || substr(hx, 19, 2) || substr(hx, 17, 2))::INT END AS height,
        |  CASE WHEN isgif THEN (gct = 1) END AS has_gct,
        |  CASE WHEN isgif AND gct = 1
        |       THEN (2 << (packed % 8))::INT END AS gct_entries,
        |  n_bytes
        |FROM g ORDER BY doc_id""".stripMargin,
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
    // every LE field is byte-swapped into place on BOTH the build and
    // the parse side; casts guarded behind the iswav flag (an opaque
    // 16-byte payload has no chars at the field offsets)
    // same hex transcripts, same dynamic offsets recomputed from the
    // ftyp size — the `//` division and '0x' casts mirror Spark's DIV
    // and conv; opaque-before-mdat precedence matches the Spark CASE
    "q_mm_video" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 29 AS family FROM documents),
        |parts AS (
        |  SELECT doc_id, family,
        |    CASE WHEN family % 3 = 0 THEN '69736F6D'
        |         WHEN family % 3 = 1 THEN '6D703432'
        |         ELSE '61766331' END AS brand,
        |    CASE WHEN family % 4 = 0 THEN 600
        |         WHEN family % 4 = 1 THEN 1000
        |         WHEN family % 4 = 2 THEN 90000
        |         ELSE 48000 END AS ts,
        |    1000 + family * 977 AS dur
        |  FROM d),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN family % 5 = 4 THEN upper(md5('vopaque' || family))
        |    WHEN family % 7 = 5 THEN
        |      '0000001466747970' || brand || '000002006D703431' ||
        |      '000000186D646174' || upper(md5('mdat' || family)) ||
        |      '000000746D6F6F760000006C6D76686400000000' ||
        |      '0000000000000000' ||
        |      lpad(hex(ts), 8, '0') || lpad(hex(dur), 8, '0')
        |    ELSE
        |      '0000001466747970' || brand || '000002006D703431' ||
        |      '000000746D6F6F760000006C6D76686400000000' ||
        |      '0000000000000000' ||
        |      lpad(hex(ts), 8, '0') || lpad(hex(dur), 8, '0') ||
        |      upper(md5('vtail' || family)) END AS phex
        |  FROM parts),
        |parsed AS (
        |  SELECT doc_id, upper(hex(unhex(phex))) AS hx FROM px),
        |fs AS (
        |  SELECT doc_id, hx,
        |    length(hx) >= 64 AND substr(hx, 9, 8) = '66747970' AS is_mp4,
        |    CASE WHEN length(hx) >= 64 AND substr(hx, 9, 8) = '66747970'
        |      THEN ('0x' || substr(hx, 1, 8))::BIGINT END AS fsz
        |  FROM parsed),
        |ok AS (
        |  SELECT doc_id, hx, is_mp4, fsz,
        |    is_mp4 AND substr(hx, (fsz + 4) * 2 + 1, 8) = '6D6F6F76'
        |      AND substr(hx, (fsz + 12) * 2 + 1, 8) = '6D766864'
        |      AND substr(hx, (fsz + 16) * 2 + 1, 8) = '00000000' AS moov_ok
        |  FROM fs)
        |SELECT doc_id,
        |  CASE WHEN is_mp4 THEN 'mp4' ELSE 'unknown' END AS format,
        |  CASE WHEN is_mp4 THEN
        |    CASE substr(hx, 17, 8) WHEN '69736F6D' THEN 'isom'
        |      WHEN '6D703432' THEN 'mp42' WHEN '61766331' THEN 'avc1'
        |      ELSE 'other' END END AS brand,
        |  CASE WHEN moov_ok
        |    THEN ('0x' || substr(hx, (fsz + 28) * 2 + 1, 8))::BIGINT
        |    END AS timescale,
        |  CASE WHEN moov_ok
        |    THEN ('0x' || substr(hx, (fsz + 32) * 2 + 1, 8))::BIGINT
        |    END AS duration_units,
        |  CASE WHEN moov_ok
        |    THEN (('0x' || substr(hx, (fsz + 32) * 2 + 1, 8))::BIGINT * 1000)
        |      // ('0x' || substr(hx, (fsz + 28) * 2 + 1, 8))::BIGINT
        |    END AS duration_ms
        |FROM ok ORDER BY doc_id""".stripMargin,
    "q_mm_audio" ->
      """WITH d AS (SELECT doc_id, doc_id % 23 AS family FROM documents),
        |p AS (
        |  SELECT doc_id, family,
        |    (CASE family % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |          WHEN 2 THEN 22050 WHEN 3 THEN 44100
        |          ELSE 48000 END)::BIGINT AS rate,
        |    (1 + family % 2)::BIGINT AS ch,
        |    (CASE family % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
        |          ELSE 32 END)::BIGINT AS bits,
        |    (1000 + family * 977)::BIGINT AS nsamp
        |  FROM d),
        |hexed AS (
        |  SELECT *, ch * bits // 8 AS align, nsamp * (ch * bits // 8) AS dsz,
        |    rate * (ch * bits // 8) AS brate
        |  FROM p),
        |le AS (
        |  SELECT *,
        |    substr(lpad(hex(ch),4,'0'),3,2) ||
        |      substr(lpad(hex(ch),4,'0'),1,2) AS chLE,
        |    substr(lpad(hex(rate),8,'0'),7,2) ||
        |      substr(lpad(hex(rate),8,'0'),5,2) ||
        |      substr(lpad(hex(rate),8,'0'),3,2) ||
        |      substr(lpad(hex(rate),8,'0'),1,2) AS rateLE,
        |    substr(lpad(hex(align),4,'0'),3,2) ||
        |      substr(lpad(hex(align),4,'0'),1,2) AS alignLE,
        |    substr(lpad(hex(bits),4,'0'),3,2) ||
        |      substr(lpad(hex(bits),4,'0'),1,2) AS bitsLE,
        |    substr(lpad(hex(dsz),8,'0'),7,2) ||
        |      substr(lpad(hex(dsz),8,'0'),5,2) ||
        |      substr(lpad(hex(dsz),8,'0'),3,2) ||
        |      substr(lpad(hex(dsz),8,'0'),1,2) AS dszLE,
        |    substr(lpad(hex(brate),8,'0'),7,2) ||
        |      substr(lpad(hex(brate),8,'0'),5,2) ||
        |      substr(lpad(hex(brate),8,'0'),3,2) ||
        |      substr(lpad(hex(brate),8,'0'),1,2) AS brLE
        |  FROM hexed),
        |payloads AS (
        |  SELECT doc_id,
        |    CASE WHEN family % 4 = 3 THEN upper(md5('opaque' || family))
        |    ELSE '52494646' || '00000000' || '57415645' || '666D7420' ||
        |      '10000000' || '0100' || chLE || rateLE || brLE || alignLE ||
        |      bitsLE || '64617461' || dszLE || upper(md5('wavtail' || family))
        |    END AS phex
        |  FROM le),
        |parsed AS (SELECT doc_id, upper(hex(unhex(phex))) AS h FROM payloads),
        |flagged AS (
        |  SELECT doc_id, h,
        |    length(h) >= 88 AND substr(h,1,8) = '52494646'
        |      AND substr(h,17,8) = '57415645' AND substr(h,25,8) = '666D7420'
        |      AND substr(h,73,8) = '64617461' AS iswav
        |  FROM parsed),
        |meta AS (
        |  SELECT doc_id, iswav,
        |    CASE WHEN iswav THEN ('0x' || substr(h,47,2) ||
        |      substr(h,45,2))::BIGINT END AS channels,
        |    CASE WHEN iswav THEN ('0x' || substr(h,55,2) || substr(h,53,2) ||
        |      substr(h,51,2) || substr(h,49,2))::BIGINT END AS sample_rate,
        |    CASE WHEN iswav THEN ('0x' || substr(h,67,2) ||
        |      substr(h,65,2))::BIGINT END AS block_align,
        |    CASE WHEN iswav THEN ('0x' || substr(h,71,2) ||
        |      substr(h,69,2))::BIGINT END AS bits,
        |    CASE WHEN iswav THEN ('0x' || substr(h,87,2) || substr(h,85,2) ||
        |      substr(h,83,2) || substr(h,81,2))::BIGINT END AS dsz
        |  FROM flagged)
        |SELECT doc_id,
        |  CASE WHEN iswav THEN 'wav' ELSE 'unknown' END AS format,
        |  channels, sample_rate, bits,
        |  dsz // block_align AS n_samples,
        |  (dsz // block_align) * 1000 // sample_rate AS duration_ms
        |FROM meta ORDER BY doc_id""".stripMargin,
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
