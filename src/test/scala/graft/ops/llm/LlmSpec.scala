package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LlmSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")

  test("MinHash LSH: high recall at J>=0.8 vs exhaustive; verified precision exact") {
    val truth = NearDup.allPairsJaccard(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = NearDup.minHashNearDups(docs, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification stage makes precision exact by construction
    assert(found.subsetOf(truth))
    // recall: 8 bands x 4 rows → P(candidate | J=0.8) ≈ 1-(1-0.8^4)^8 ≈ 0.98
    if (truth.nonEmpty)
      assert(found.size.toDouble / truth.size >= 0.9,
        s"recall ${found.size}/${truth.size}")
  }

  test("MinHash signatures are deterministic across runs") {
    val s1 = NearDup.minHashSignatures(NearDup.tokenSets(docs, "doc_id", "text"), 8)
    val s2 = NearDup.minHashSignatures(NearDup.tokenSets(docs, "doc_id", "text"), 8)
    assert(s1.exceptAll(s2).isEmpty)
  }

  test("SimHash: identical docs collide; perturbed docs stay close; distinct far") {
    import spark.implicits._
    // large-ish token set: one added token flips few majority bits
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base),                                   // exact dup
      (3L, base + " omega"),                        // near dup
      (4L, (1 to 60).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fp = NearDup.simHash(NearDup.tokenSets(d, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    val nearDist = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val farDist = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(nearDist < farDist, s"near=$nearDist far=$farDist")
    assert(farDist > 15)
    val nd = NearDup.simHashNearDups(d, "doc_id", "text", maxDistance = nearDist)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L)) && nd.contains((1L, 3L)))
    assert(!nd.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("bucketed ANN matches brute force for same-bucket neighbours") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Knn.bruteForceTopK(queries, emb, 3)
    val bucketed = Knn.bucketedTopK(queries, emb, "label", 50)
    // every bucketed hit must appear in the exhaustive ranking with
    // identical similarity
    val bruteAll = Knn.bruteForceTopK(queries, emb, Int.MaxValue)
      .select("q_vec_id", "c_vec_id", "sim")
    assert(bucketed.select("q_vec_id", "c_vec_id", "sim")
      .exceptAll(bruteAll).isEmpty)
    assert(brute.count() === 5 * 3)
  }

  test("hyperplane LSH: recall >= 0.9 at cosine 0.9 vs exhaustive truth; precision exact") {
    import spark.implicits._
    // the corpus embeddings have no high-cosine pairs (max ~0.48), so
    // build a seeded fixture: 40 random bases, each with a perturbed
    // near-copy (cosine ~0.95+) — ground truth from an exact all-pairs
    val dim = 32
    val rnd = new scala.util.Random(7L)
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + (rnd.nextGaussian() * 0.1).toFloat)
    val bases = (0 until 40).map(_ => vec())
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, perturb(v).toSeq))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val truth = {
      def cos(a: Seq[Float], b: Seq[Float]) = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
             math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia < ib && cos(va, vb) >= 0.9
      } yield (ia, ib)).toSet
    }
    assert(truth.size >= 30, s"fixture degenerate: only ${truth.size} true pairs")
    val found = Knn.cosineNearDups(corpus, dim, threshold = 0.9,
        nPlanes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cosine is verified on every candidate → precision exact by construction
    assert(found.subsetOf(truth))
    // 4 bands x 4 bits: P(candidate | cos=0.9) ≈ 1-(1-0.856^4)^4 ≈ 0.95
    assert(found.size.toDouble / truth.size >= 0.9,
      s"recall ${found.size}/${truth.size}")
  }

  test("IVF: nprobe=k equals brute force exactly; recall monotone in nprobe") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val cents = Knn.ivfCentroids(emb, dim = 64, k = 8, iters = 3)
    assert(cents.length === 8)
    // every centroid is unit-length (spherical k-means invariant)
    cents.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9) }
    // determinism: same seed → same codebook
    val cents2 = Knn.ivfCentroids(emb, dim = 64, k = 8, iters = 3)
    assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq)

    val brute = Knn.bruteForceTopK(queries, emb, 5)
      .select("q_vec_id", "rn", "c_vec_id", "sim")
    // probing every bucket IS brute force — exact equality, not recall
    val full = Knn.ivfTopK(queries, emb, cents, k = 5, nprobe = 8)
      .select("q_vec_id", "rn", "c_vec_id", "sim")
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty)

    def recall(nprobe: Int): Double = {
      val truth = brute.select("q_vec_id", "c_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Knn.ivfTopK(queries, emb, cents, k = 5, nprobe = nprobe)
        .select("q_vec_id", "c_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1); val r4 = recall(4)
    assert(r4 >= r1, s"recall must not fall as nprobe grows: r1=$r1 r4=$r4")
    assert(r4 >= 0.5, s"nprobe=4 of 8 buckets should find most neighbours: $r4")
  }

  test("lshCandidatesWithStats reports dropped mega-buckets instead of hiding them") {
    import spark.implicits._
    val mega = "spam " * 40
    val docsDf = ((1L to 30L).map(i => (i, mega)) ++
      Seq((100L, "unique alpha beta gamma delta epsilon"),
          (101L, "unique alpha beta gamma delta epsilon")))
      .toDF("doc_id", "text")
    val sig = NearDup.minHashSignatures(
      NearDup.tokenSets(docsDf, "doc_id", "text"), k = 8)
    val (cand, dropped) = NearDup.lshCandidatesWithStats(
      sig, bands = 4, rowsPerBand = 2, maxBucketSize = 10)
    val d = dropped.collect()
    // the 30 identical docs share every band bucket → all 4 dropped
    assert(d.length === 4, s"dropped=${d.mkString(",")}")
    assert(d.forall(_.getAs[Long]("bucket_size") === 30L))
    // recall loss is now visible; the small clean bucket still pairs
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
  }

  test("shingleNearDups: finds in-word edits that word-token Jaccard misses") {
    import spark.implicits._
    val base = "thequickbrownfoxjumpsoverthelazydogandkeepsrunningallday"
    val d = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")),      // one in-word edit, no spaces
      (3L, "completelydifferentcontentwithnothingsharedatallhonestly"))
      .toDF("doc_id", "text")
    // word view: each doc is ONE token → Jaccard(1,2) = 0, invisible
    val word = NearDup.minHashNearDups(d, "doc_id", "text", threshold = 0.5)
    assert(word.count() === 0)
    // shingle view: the edit shifts only ~n shingles → high Jaccard
    val found = NearDup.shingleNearDups(d, "doc_id", "text", n = 5,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === Set((1L, 2L)), s"got $found")
  }

  test("simHashPortable: identical docs collide, near docs closer than far") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, base), (2L, base), (3L, base + " omega"),
      (4L, (1 to 60).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sets = d.select($"doc_id", array_distinct(split($"text", " ")).as("tokens"))
    val fp = NearDup.simHashPortable(sets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    val near = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val far = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(near < far, s"near=$near far=$far")
  }

  test("charShingles: correct n-gram window") {
    import spark.implicits._
    val out = Seq("abcd").toDF("t")
      .select(NearDup.charShingles($"t", 3).as("s")).head().getSeq[String](0)
    assert(out.toSet === Set("abc", "bcd"))
  }

  test("language ID: profiles classify the corpus deterministically") {
    val profiles = TextAnalysis.buildProfiles(docs, "lang", "text")
    assert(profiles.count() === docs.select("lang").distinct().count())
    val pred = TextAnalysis.classifyLanguage(docs, profiles, "doc_id", "text")
    assert(pred.count() === docs.count())
    val p2 = TextAnalysis.classifyLanguage(docs, profiles, "doc_id", "text")
    assert(pred.exceptAll(p2).isEmpty)
  }

  test("rolling fingerprint is order-sensitive, bag hash is not") {
    import spark.implicits._
    val d = Seq(("a b c"), ("c b a")).toDF("text")
      .select(TextAnalysis.rollingFingerprint($"text").as("fp"))
      .collect().map(_.getLong(0))
    assert(d(0) !== d(1))
  }

  test("multimodal: parquet round-trip, dedup, deterministic stub features") {
    import spark.implicits._
    val media = Multimodal.fixture(spark, 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    // compare names+types (nullability flags differ through parquet)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() === 50)
    // plant a duplicate payload
    val dup = media.limit(1).withColumn("media_id", lit(999L))
    val deduped = Multimodal.dedupByContent(media.unionByName(dup))
    assert(deduped.count() === 50)
    assert(deduped.filter($"media_id" === 999L).count() === 0)
    // decode pipeline: deterministic, feature dim 16, mass ≈ 1
    val feats = Multimodal.decodePipeline(
      Multimodal.repartitionForDecode(media, 4))
    val r = feats.orderBy($"media_id").head()
    assert(r.getAs[Seq[Float]]("features").length === 16)
    assert(math.abs(r.getAs[Seq[Float]]("features").sum - 1.0f) < 1e-4)
    val again = Multimodal.decodePipeline(media).orderBy($"media_id").head()
    assert(r.getAs[Double]("byte_mean") === again.getAs[Double]("byte_mean"))
    // frame sampling only emits for video rows
    val frames = Multimodal.sampleFrames(media, 4)
    val nVideo = media.filter($"meta.mime" === "video/mp4").count()
    assert(frames.count() === nVideo * 4)
  }

  test("gifMeta: LE dims, version split, GCT flag/size; truncated and " +
      "foreign payloads stay unknown") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 300x200 89a with a 256-entry GCT (packed 0x87), 16x16 87a
    // without, a truncated magic-only stub, and a PNG payload
    val rows = Seq(
      (1L, "4749463839612C01C80087" + "0000" + "AA" * 8),
      (2L, "4749463837611000100000" + "0000" + "BB" * 8),
      (3L, "474946383961"),
      (4L, "89504E470D0A1A0A" + "00" * 10)
    ).toDF("id", "phex")
      .withColumn("m", Multimodal.gifMeta(unhex($"phex")))
      .select($"id", $"m.format", $"m.width", $"m.height",
        $"m.has_gct", $"m.gct_entries")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(1L) === Seq("gif89a", 300, 200, true, 256))
    assert(rows(2L) === Seq("gif87a", 16, 16, false, null))
    assert(rows(3L) === Seq("unknown", null, null, null, null))
    assert(rows(4L) === Seq("unknown", null, null, null, null))
  }

  test("dHash perceptual near-dup: few-pixel perturbations land within " +
      "hamming 3, scrambles and foreign payloads never pair; " +
      "bucket-join plan, no all-pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    def pixels(): String = Array.fill(63)(f"${rnd.nextInt(256)}%02X").mkString
    val bases = (0L until 30L).map(i => (i, pixels())).toMap
    // twins of 0..4: three row-start pixels overwritten (≤3 bit flips);
    // scramble of 5: fresh pixels entirely; 99: a non-IMGG payload
    def overwrite(p: String): String =
      "00" + p.substring(2, 18) + "00" + p.substring(20, 36) +
        "00" + p.substring(38)
    val rows =
      bases.toSeq.map { case (i, p) => (i, "494D47470907" + p) } ++
        (0L until 5L).map(i => (100L + i, "494D47470907" + overwrite(bases(i)))) ++
        Seq((105L, "494D47470907" + pixels()),
          (99L, "FFD8FF" + "00" * 66))
    val media = rows.toDF("doc_id", "phex")
      .withColumn("payload", unhex($"phex"))
    val dups = Multimodal.dHashNearDups(media, "doc_id", maxDistance = 3)
    val found = dups.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    (0L until 5L).foreach(i => assert(
      found.exists(p => p._1 == i && p._2 == 100L + i && p._3 <= 3),
      s"planted twin ($i, ${100 + i}) not detected: ${found.toSeq}"))
    assert(!found.exists(p => p._1 == 105L || p._2 == 105L),
      "a scrambled image must not pair")
    assert(!found.exists(p => p._1 == 99L || p._2 == 99L),
      "a non-IMGG payload must not enter the join")
    // the candidate generator is a bucket equi-join, never all-pairs
    val plan = dups.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"dHash near-dup must bucket-join:\n$plan")
  }
}
