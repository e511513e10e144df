package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-5 LLM-pipeline operators: PII redaction, deterministic
  * sampling/splitting, int8 quantization, duplicate clustering. */
class PipelineOpsSpec extends SparkSpec {

  // ---- PII ----

  test("pii: detects and redacts email, phone, and ipv4; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jo.smith+x@corp.example.org or 555-123-4567"),
      (2L, "server 192.168.0.1 answered"),
      (3L, "nothing sensitive here")
    ).toDF("id", "text")
    val out = df.select(
      $"id",
      PiiRedact.countMatches($"text", PiiRedact.EmailPattern).as("ne"),
      PiiRedact.countMatches($"text", PiiRedact.PhonePattern).as("np"),
      PiiRedact.countMatches($"text", PiiRedact.Ipv4Pattern).as("ni"),
      PiiRedact.redact($"text").as("red"),
      PiiRedact.hasPii($"text").as("has"))
      .orderBy($"id").collect()
    assert(out(0).getAs[Int]("ne") == 1 && out(0).getAs[Int]("np") == 1)
    assert(out(0).getAs[String]("red") ==
      "reach me at <EMAIL> or <PHONE>")
    assert(out(1).getAs[Int]("ni") == 1 &&
      out(1).getAs[String]("red") == "server <IP> answered")
    assert(out(2).getAs[String]("red") == "nothing sensitive here")
    assert(out.map(_.getAs[Boolean]("has")).toSeq == Seq(true, true, false))
  }

  test("pii: redacted output contains no residual matches") {
    import spark.implicits._
    val docs = graft.Tables.table(spark, sfSmoke, "documents")
      .select($"doc_id", concat($"text",
        lit(" mail a@b.co ip 10.0.0.1 tel 555-000-1111")).as("text"))
    val residual = docs.select(PiiRedact.redact($"text").as("red"))
      .filter(PiiRedact.hasPii($"red"))
    assert(residual.isEmpty)
  }

  test("text clean: strips urls and tags, renormalizes whitespace, leaves clean text") {
    import spark.implicits._
    val df = Seq(
      (1L, "read <a href=\"https://x.com/a\">this</a> at https://ex.com/p?a=1&b=2 now"),
      (2L, "plain text stays untouched"),
      (3L, "<p>wrapped</p>   and   spaced")
    ).toDF("id", "text")
    val out = df.select($"id",
      TextClean.countMatches($"text", TextClean.UrlPattern).as("nu"),
      TextClean.countMatches($"text", TextClean.HtmlTagPattern).as("nt"),
      TextClean.clean($"text").as("c")).orderBy($"id").collect()
    assert(out(0).getAs[String]("c") == "read this at now")
    assert(out(0).getAs[Int]("nt") == 2)
    assert(out(1).getAs[String]("c") == "plain text stays untouched")
    assert(out(2).getAs[String]("c") == "wrapped and spaced" &&
      out(2).getAs[Int]("nt") == 2)
  }

  // ---- Sampling ----

  test("stratified sample is deterministic and respects per-stratum rates") {
    import spark.implicits._
    val docs = graft.Tables.table(spark, sfSmoke, "documents")
    val rates = Map("en" -> 60, "zh" -> 40)
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 25)
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 25)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty &&
      s2.select("doc_id").except(s1.select("doc_id")).isEmpty,
      "same config must select the same rows")
    // the md5 bucket is uniform, so kept/total per stratum tracks the
    // rate; small strata get a loose tolerance
    val got = s1.groupBy("lang").agg(count(lit(1)).as("kept"))
      .join(docs.groupBy("lang").agg(count(lit(1)).as("total")), "lang")
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("kept").toDouble / r.getAs[Long]("total"))).toMap
    got.foreach { case (lang, frac) =>
      val want = rates.getOrElse(lang, 25) / 100.0
      assert(math.abs(frac - want) < 0.22,
        s"$lang kept fraction $frac too far from $want")
    }
  }

  test("priority sample: weight-proportional in aggregate, deterministic, " +
      "two-phase equals the one-window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val out = Sampling.qLlmSampleWeighted(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // exactly k per lang (or all docs if a lang has fewer), rk dense
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Int]("rk")).sorted
      assert(rks.sameElements(1 to rks.length))
      assert(rks.length <= 10)
    }
    // determinism: a second run picks the identical sample
    val again = Sampling.qLlmSampleWeighted(spark, sfSmoke).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
    // two-phase pre-filter is invisible: equals the plain one-window form
    val docs = graft.Tables.table(spark, sfSmoke, "documents")
      .select($"lang", $"doc_id",
        size(split($"text", " ")).cast("long").as("w_tokens"))
      .withColumn("priority", Sampling.priorityColumn($"doc_id", $"w_tokens"))
    val oneWindow = docs.withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"priority".desc, $"doc_id".asc)))
      .filter($"rk" <= 10)
      .select($"lang", $"rk", $"doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val twoPhase = out.map(r =>
      (r.getAs[String]("lang"), r.getAs[Int]("rk"), r.getAs[Long]("doc_id"))).toSet
    assert(twoPhase === oneWindow)
    // weight-proportionality (statistical): the sampled docs' mean
    // weight exceeds the corpus mean — long docs are favoured
    val sampledMean = out.map(_.getAs[Long]("w_tokens")).sum.toDouble / out.length
    val corpusMean = docs.agg(avg($"w_tokens")).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean <= corpus mean $corpusMean")
  }

  test("vocab coverage: monotone in K, bounded by 1, exact top-K masses") {
    val rows = CorpusStats.qLlmVocabCoverage(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("top_k")).toSeq == Seq(10L, 100L, 1000L))
    val cov = rows.map(_.getAs[Double]("coverage_4dp"))
    assert(cov.sameElements(cov.sorted), "coverage must grow with K")
    assert(cov.forall(c => c > 0 && c <= 1.0))
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total"))
      assert(r.getAs[Long]("n_terms") <= r.getAs[Long]("top_k"))
    }
  }

  test("curriculum: three phases cover the corpus; stop density orders " +
      "phases easy-to-hard") {
    val rows = CorpusStats.qLlmCurriculum(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("phase")).toSeq == Seq(1L, 2L, 3L))
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === spark.read.parquet(s"$sfSmoke/documents.parquet").count())
    // phase 1 = stop-heaviest (easy natural text), density non-increasing
    val dens = rows.map(_.getAs[Double]("stop_density_4dp"))
    assert(dens.sameElements(dens.sorted.reverse),
      s"stop density not decreasing: ${dens.mkString(",")}")
    // tertiles are roughly balanced (boundary ties may shift a few docs)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n > total / 6, s"phase ${r.getAs[Long]("phase")} has only $n docs")
    }
  }

  test("keywords: dense top-3 per doc, scores non-increasing, terms real") {
    val rows = CorpusStats.qLlmKeywords(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).sameElements(1 to sorted.length))
      assert(sorted.length <= 3)
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      sorted.foreach(r => assert(r.getAs[Long]("tf") >= 1))
    }
  }

  test("url canonicalization: every variant class normalizes; dedup is " +
      "exactly by canonical form") {
    import spark.implicits._
    val fx = Seq(
      (1L, "https://WWW.Shop.Example.COM:443/a/?utm_source=x&id=1"),
      (2L, "https://shop.example.com/a/?id=1"),          // already canonical
      (3L, "HTTP://Shop.Example.com/b?ref=mail"),        // ref-only query
      (4L, "https://other.example.com/a/?id=1")          // different host
    ).toDF("doc_id", "url")
    val out = UrlCanon.withCanonical(fx, "url").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canonical")).toMap
    assert(out(1L) === "https://shop.example.com/a/?id=1")
    assert(out(2L) === "https://shop.example.com/a/?id=1") // 1 and 2 collapse
    assert(out(3L) === "http://shop.example.com/b")        // dangling ? stripped
    assert(out(4L) === "https://other.example.com/a/?id=1")
    val report = UrlCanon.qLlmUrlCanon(spark, sfSmoke).collect()
    assert(report.nonEmpty)
    val nDocs = spark.read.parquet(s"$sfSmoke/documents.parquet").count()
    assert(report.map(_.getAs[Long]("n_variants")).sum === nDocs)
    report.foreach { r =>
      val c = r.getAs[String]("canonical")
      assert(!c.contains("utm_") && !c.contains("ref=") &&
        !c.contains(":443") && !c.contains("WWW") && !c.contains("www."), c)
      assert(r.getAs[Long]("n_raw_forms") <= r.getAs[Long]("n_variants"))
    }
  }

  test("split assignment partitions every row into exactly one of train/val/test") {
    import spark.implicits._
    val docs = graft.Tables.table(spark, sfSmoke, "documents")
      .withColumn("split", Sampling.assignSplit($"doc_id", 80, 10))
    val byrow = docs.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    assert(byrow.keySet.subsetOf(Set("train", "val", "test")))
    assert(byrow.values.sum == docs.count())
    assert(byrow("train") > byrow.getOrElse("val", 0L),
      "train must dominate at 80/10/10")
  }

  test("sample and split salts are independent (split distribution inside the sample)") {
    import spark.implicits._
    val docs = graft.Tables.table(spark, sfSmoke, "documents")
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 60), 25)
      .withColumn("split", Sampling.assignSplit($"doc_id", 80, 10))
    val trainFrac = kept.filter($"split" === "train").count().toDouble /
      kept.count()
    assert(math.abs(trainFrac - 0.8) < 0.15,
      s"train fraction inside the sample was $trainFrac — correlated salts?")
  }

  // ---- Quantization ----

  test("int8 quantization: codes bounded, max element hits ±127, error bounded") {
    import spark.implicits._
    val emb = graft.Tables.table(spark, sfSmoke, "embeddings")
      .withColumn("v", Knn.asDouble($"embedding"))
      .withColumn("scale", Quantize.absmaxScale($"v"))
      .withColumn("codes", Quantize.int8Codes($"v", $"scale"))
      .withColumn("cmax", array_max(transform($"codes", c => abs(c))))
      .withColumn("err", Quantize.maxAbsError($"v", $"codes", $"scale"))
    assert(emb.filter($"cmax" > 127).isEmpty, "codes must fit int8")
    assert(emb.filter($"cmax" =!= 127).isEmpty,
      "absmax scaling maps the max-magnitude element to ±127")
    // half-up rounding error <= scale/254 (+ tiny fp slack)
    assert(emb.filter($"err" > $"scale" / 254.0 + 1e-12).isEmpty,
      "reconstruction error exceeded the absmax int8 bound")
  }

  test("int8 quantization roundtrip bound holds on random vectors (property)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val genVec: Gen[Array[Double]] = for {
      d <- Gen.chooseNum(1, 32)
      v <- Gen.listOfN(d, Gen.chooseNum(-1e6, 1e6).map(_ / 1e3))
    } yield v.toArray
    val prop = Prop.forAll(Gen.listOfN(16, genVec)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .withColumn("scale", Quantize.absmaxScale($"v"))
        .withColumn("codes", Quantize.int8Codes($"v", $"scale"))
        .withColumn("cmax", array_max(transform($"codes", c => abs(c))))
        .withColumn("err", Quantize.maxAbsError($"v", $"codes", $"scale"))
      df.filter($"cmax" > 127 || $"err" > $"scale" / 254.0 + 1e-9).isEmpty
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10)
        .withInitialSeed(Seed(20260813L)), prop)
    assert(result.passed, result.status.toString)
  }

  test("int8 quantization: zero vector yields zero codes, not NaN") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0, 0.0, 0.0))).toDF("id", "v")
      .withColumn("scale", Quantize.absmaxScale($"v"))
      .withColumn("codes", Quantize.int8Codes($"v", $"scale"))
    val r = df.select($"scale", $"codes").head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getSeq[Int](1) == Seq(0, 0, 0))
  }

  test("int8-quantized cosine search preserves exact top-5 ranking quality") {
    import spark.implicits._
    // the point of quantization at scale: search over codes (a quarter
    // of the bytes through every shuffle/scan) without losing the
    // neighbors. Rank by the dequantized dot product and compare the
    // top-5 sets against exact float cosine.
    val emb = graft.Tables.table(spark, sfSmoke, "embeddings")
      .withColumn("v", Knn.asDouble($"embedding"))
      .withColumn("scale", Quantize.absmaxScale($"v"))
      .withColumn("codes", Quantize.int8Codes($"v", $"scale"))
    val exact = Knn.bruteForceTopK(emb.filter($"vec_id" < 5), emb, k = 5)
      .select($"q_vec_id", $"c_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_vec_id"), $"codes".as("qc"), $"scale".as("qs"))
    val scored = q.crossJoin(
        emb.select($"vec_id".as("c_vec_id"), $"codes".as("cc"), $"scale".as("cs")))
      .filter($"q_vec_id" =!= $"c_vec_id")
      // integer dot of codes, scaled back: (Σ qc·cc)·qs·cs/127² — then
      // normalized by the dequantized norms for a cosine-equivalent
      .withColumn("dot",
        aggregate(zip_with($"qc", $"cc", (a, b) => a.cast("long") * b),
          lit(0L), (acc, x) => acc + x).cast("double") *
          $"qs" * $"cs" / lit(127.0 * 127.0))
      .withColumn("qn", sqrt(aggregate(zip_with($"qc", $"qc",
        (a, b) => a.cast("long") * b), lit(0L), (acc, x) => acc + x)
        .cast("double")) * $"qs" / lit(127.0))
      .withColumn("cn", sqrt(aggregate(zip_with($"cc", $"cc",
        (a, b) => a.cast("long") * b), lit(0L), (acc, x) => acc + x)
        .cast("double")) * $"cs" / lit(127.0))
      .withColumn("sim", $"dot" / ($"qn" * $"cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_vec_id").orderBy($"sim".desc, $"c_vec_id".asc)
    val approx = scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"q_vec_id", $"c_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"int8 search recall $recall < 0.9 vs exact float cosine")
  }

  // ---- Dedup clustering ----

  test("connected components: two chains and an isolated edge cluster correctly") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val cc = DedupCluster.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
  }

  test("connected components: direction and duplicate edges don't matter") {
    import spark.implicits._
    val e1 = Seq((5L, 9L), (9L, 7L)).toDF("src", "dst")
    val e2 = Seq((9L, 5L), (7L, 9L), (9L, 7L)).toDF("src", "dst")
    val c1 = DedupCluster.connectedComponents(e1, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c2 = DedupCluster.connectedComponents(e2, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c1 == c2 && c1 == Set((5L, 5L), (7L, 5L), (9L, 5L)))
  }

  test("assignClusters: singletons keep their own id; members share the min") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val edges = Seq((2L, 4L)).toDF("doc_a", "doc_b")
    val out = DedupCluster.assignClusters(docs, edges, "doc_id",
        "doc_a", "doc_b")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 5L))
  }

  // ---- Contamination ----

  test("tokenShingles: 4-token windows, short rows yield no shingles") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "x y z")).toDF("id", "text")
      .select($"id", split($"text", " ").as("toks"))
      .select($"id", Contamination.tokenShingles($"toks", 4).as("sh"))
      .orderBy($"id").collect()
    assert(df(0).getSeq[String](1) == Seq("a b c d", "b c d e"))
    assert(df(1).getSeq[String](1).isEmpty)
  }

  test("crossSplitOverlap: a test doc copying train text is flagged; clean docs absent") {
    import spark.implicits._
    val train = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "train", train),
      (2L, "train", "completely different training material here for padding"),
      (10L, "test", train + " with a small suffix"),           // contaminated
      (11L, "test", "novel held out evaluation text nothing shared at all"))
      .toDF("doc_id", "split", "text")
    val out = Contamination.crossSplitOverlap(docs, "doc_id", "text",
        "split", "test", "train", n = 4, minHits = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out.contains(10L) && out(10L)._2,
      s"copied doc must be flagged contaminated: $out")
    assert(out(10L)._1 >= 8, "nearly every 4-gram of the copy is shared")
    assert(!out.contains(11L), "clean doc must not appear in the report")
  }

  test("crossSplitOverlap hashJoinKeys=true: identical report on the " +
      "corpus, and the string shingle is pruned off the exchanges") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .withColumn("split",
        graft.ops.llm.Sampling.assignSplit(col("doc_id"), 80, 10, "split"))
    def run(hashed: Boolean) =
      Contamination.crossSplitOverlap(docs, "doc_id", "text", "split",
        "test", "train", n = 4, minHits = 5, hashJoinKeys = hashed)
    val byId = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated")))).toMap
    assert(byId(run(true)) === byId(run(false)),
      "hashed join keys must reproduce the string-keyed report exactly " +
        "(no 64-bit collisions on this corpus)")
    // transport claim: no string column survives into the hashed plan's
    // exchanges — every shuffle carries the 8-byte key (+ doc_id).
    // Typed walk (incl. adaptive stages): a plan-STRING grep is vacuous
    // here, because exchange lines print attributes as name#id with no
    // type token for strings
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val hashed = run(true)
    hashed.collect() // materialize so adaptive stages are final
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    val exchanges = walk(hashed.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected shuffles in the contamination plan")
    exchanges.foreach(e => assert(
      !e.output.exists(_.dataType ==
        org.apache.spark.sql.types.StringType),
      s"hashed variant must not shuffle strings: ${e.output.mkString(", ")}"))
    // the same walk CAN fail: the string-keyed plan does shuffle strings
    val plain = run(false)
    plain.collect()
    assert(walk(plain.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
      .exists(_.output.exists(_.dataType ==
        org.apache.spark.sql.types.StringType)),
      "sanity: the string-keyed plan must shuffle a string column")
  }

  test("connected components converges on a long chain (diameter stress)") {
    import spark.implicits._
    val n = 40
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst")
    val cc = DedupCluster.connectedComponents(edges, "src", "dst")
    assert(cc.filter($"cluster" =!= 1L).isEmpty,
      s"all $n chain nodes must collapse to cluster 1")
  }

  // ---- End-to-end corpus pipeline ----

  test("CorpusPipeline.prepare: scrubs, filters, dedups, clusters, splits — deterministically") {
    import spark.implicits._
    val real = graft.Tables.table(spark, sfSmoke, "documents")
      .select($"doc_id", $"text", $"lang")
    // plant: an exact duplicate of doc 0 (id 9001), a near-duplicate
    // of doc 1 (id 9002, one word changed), a PII doc (id 9003), and
    // a too-short doc (id 9004)
    val d0 = real.filter($"doc_id" === 0).head().getString(1)
    val d1words = real.filter($"doc_id" === 1).head().getString(1).split(" ")
    val nearD1 = (d1words.take(d1words.length - 1) :+ "changedword").mkString(" ")
    val planted = Seq(
      (9001L, d0, "en"),
      (9002L, nearD1, "en"),
      (9003L, d0 + " contact leak@example.com now or call 555-123-9999 ok", "en"),
      (9004L, "way too short", "en"),
      (9005L, null.asInstanceOf[String], "en")).toDF("doc_id", "text", "lang")
    val corpus = real.unionByName(planted)
    val out = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9001L), "exact duplicate must lose to doc 0")
    assert(ids.contains(0L), "the min-id original must survive")
    assert(!ids.contains(9002L) && ids.contains(1L),
      "near-duplicate must collapse into doc 1's cluster")
    assert(!ids.contains(9004L), "short doc must be quality-filtered")
    assert(!ids.contains(9005L),
      "null-text doc must be dropped, not null-propagated to band 'ok'")
    // 9003 = doc0's text + unique suffix: survives dedup as its own
    // doc, but its PII must be scrubbed
    val redacted9003 = out.filter($"doc_id" === 9003L)
      .select("redacted").collect()
    redacted9003.foreach { r =>
      assert(!r.getString(0).contains("@") && !r.getString(0).contains("555-"),
        s"PII must be scrubbed: ${r.getString(0)}")
    }
    // deterministic end to end
    val again = CorpusPipeline.prepare(corpus, "doc_id", "text", "lang")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // split covers every survivor
    assert(out.filter(!$"split".isin("train", "val", "test")).isEmpty)
  }

  test("connected components == union-find on random graphs (property)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 30L)
        b <- Gen.chooseNum(0L, 30L)
      } yield (a, b))
    } yield es
    def unionFind(es: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id root for every node (attach roots to their min member)
      parent.keys.toSeq.map(x => x -> find(x)).toMap
    }
    val prop = Prop.forAll(genEdges) { es =>
      val expected = unionFind(es)
      val got = DedupCluster.connectedComponents(
        es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(Seed(20260812L)), prop)
    assert(result.passed, result.status.toString)
  }
  test("token budget cut: greedy hash-order prefix per stratum — " +
      "under-budget stratum taken whole, over-budget stratum stops at " +
      "the first doc whose predecessor total reaches the budget") {
    import spark.implicits._
    val out = CorpusStats.qLlmTokenBudget(spark, sfSmoke).cache()
    try {
      val docs = graft.Tables.table(spark, sfSmoke, "documents")
        .select($"lang", $"doc_id",
          size(split($"text", " ")).cast("long").as("n"))
      val totals = docs.groupBy($"lang").agg(sum($"n").as("avail"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val taken = out.groupBy($"lang")
        .agg(count(lit(1)).as("k"), sum($"n_tokens").as("tok"),
          max($"cum_before").as("max_before"))
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val docCounts = docs.groupBy($"lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      totals.foreach { case (lang, avail) =>
        val (k, tok, maxBefore) = taken(lang)
        if (avail < 5000L) {
          // whole stratum: every doc selected, total = avail
          assert(k === docCounts(lang) && tok === avail, lang)
        } else {
          // greedy prefix: last-in doc started under budget, and the
          // selected set is budget-tight (dropping it goes under)
          assert(maxBefore < 5000L, lang)
          assert(tok >= 5000L, s"$lang prefix should reach the budget")
        }
      }
      // prefix property: cum_before values are exactly the running
      // sums of the selected docs in output order (0, n1, n1+n2, ...)
      val en = out.filter($"lang" === "en")
        .orderBy($"cum_before").select($"n_tokens", $"cum_before")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      en.foldLeft(0L) { case (expect, (n, before)) =>
        assert(before === expect); expect + n
      }
    } finally { out.unpersist(); () }
  }

}
