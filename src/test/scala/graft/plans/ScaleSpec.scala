package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.cdc.PartitionedUpsert
import graft.ops.llm.Knn

/** 100 TB-posture mechanisms: salted skew joins, bucketed co-located
  * joins, partition-pruned upsert, vector LSH. */
class ScaleSpec extends SparkSpec {

  test("saltedEquiJoin: same result as plain join, key spread over salts") {
    import spark.implicits._
    // pathological skew: 10k rows of one key
    val large = (1 to 10000).map(i => ("hot", i)).toDF("k", "payload")
      .unionAll(Seq(("cold", 0)).toDF("k", "payload"))
    val small = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val plain = large.join(small, "k")
    val salted = SaltedJoin.saltedEquiJoin(large, small, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "tag").exceptAll(
      plain.select("k", "payload", "tag")).isEmpty)
  }

  test("bucketed tables co-locate: SMJ with no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b1")
    spark.sql("DROP TABLE IF EXISTS b2")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse directories persist — clear them physically
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b1", "b2").foreach { t =>
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rec))
        f.delete(): Unit
      }
      rec(new java.io.File(s"$wh/$t"))
    }
    spark.read.parquet(s"$sfSmoke/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b1")
    spark.read.parquet(s"$sfSmoke/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b2")
    val joined = spark.table("b1").hint("merge")
      .join(spark.table("b2"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("applyChunkedSnapshot is ONE shuffle (the compaction window)") {
    import spark.implicits._
    val chunks = (0L until 100L).map(k => (k, k * 1.0, 50L)).toDF("pk", "val", "wm")
    val log = (0L until 200L).map(i => (i, i % 100, "u", i * 2.0))
      .toDF("lsn", "pk", "op", "val")
    val merged = graft.ops.cdc.Cdc.applyChunkedSnapshot(
      chunks, log, Seq("pk"), "lsn", "op", Seq("val"), "wm")
    merged.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // exchanges only in the final plan section
    val plan = merged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"chunked-snapshot reconcile should shuffle ONCE on the key:\n$plan")
    // and the window is group-limited before the shuffle where possible
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("applySparse runs its whole per-key closed form on ONE log-side " +
      "exchange (stacked same-partition windows reuse the sort)") {
    import spark.implicits._
    val snap = (0L until 100L).map(k => (k, k * 1.0, s"s$k"))
      .toDF("pk", "v", "lbl")
    val log = (0L until 300L).map { i =>
      (i, i % 100, if (i % 11 == 0) "d" else "u",
        i * 2.0, i % 3 != 0, s"u$i", i % 5 != 0)
    }.toDF("lsn", "pk", "op", "v", "v_present", "lbl", "lbl_present")
    val merged = graft.ops.cdc.Cdc.applySparse(snap, log,
      Seq("pk"), "lsn", "op", Seq("v", "lbl"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // log-side barrier/override/base windows + snapshot join side:
    // exactly TWO hash exchanges — a third would mean a window spec
    // stopped sharing the partitioning (the regression this guards)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"applySparse must shuffle once per join side, found $exchanges:\n$plan")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("narrow LLM ops (pii, sample, quantize) are shuffle-free projections") {
    import spark.implicits._
    import graft.ops.llm.{PiiRedact, Quantize, Sampling}
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    def assertNoExchange(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange"),
        s"$tag must not shuffle — it is a per-row projection:\n$plan")
    }
    assertNoExchange(docs.select($"doc_id",
      PiiRedact.countMatches($"text", PiiRedact.EmailPattern).as("n"),
      PiiRedact.redact($"text").as("red")), "pii")
    assertNoExchange(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 60), 25).withColumn("split",
      Sampling.assignSplit($"doc_id", 80, 10)), "sample+split")
    assertNoExchange(emb
      .withColumn("v", graft.ops.llm.Knn.asDouble($"embedding"))
      .withColumn("scale", Quantize.absmaxScale($"v"))
      .withColumn("codes", Quantize.int8Codes($"v", $"scale")), "quantize")
    assertNoExchange(graft.ops.llm.RandomProjection.project(
      emb, "embedding", dim = 64, k = 8), "rproj")
  }

  test("q_llm_chunk shuffles only for presentation; q_llm_pack's " +
      "doc-sized window partitions by (lang, bkt) — the serial per-lang " +
      "window exists only over the bucket-summary aggregate") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    // chunking: the ONLY exchange is the contract's presentation sort
    val chunk = graft.ops.llm.LlmQueries2.qLlmChunk(spark, sfSmoke)
    chunk.collect()
    val cex = walk(chunk.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(cex.nonEmpty, "expected the presentation sort exchange")
    cex.foreach(e => assert(
      e.outputPartitioning.isInstanceOf[RangePartitioning],
      s"chunking must be map-only before the orderBy — found a " +
        s"non-range exchange: ${e.outputPartitioning}"))
    // packing: every window over doc-sized input keys (lang, bkt);
    // any per-lang-only window consumes the per-bucket AGGREGATE
    val pack = graft.ops.llm.LlmQueries2.qLlmPack(spark, sfSmoke)
    pack.collect()
    val wins = walk(pack.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window nodes in the packing plan")
    val (serial, bucketed) = wins.partition(_.partitionSpec.size == 1)
    assert(bucketed.nonEmpty,
      "the doc cumsum must partition by (lang, bkt), not lang alone")
    serial.foreach(w => assert(
      walk(w.child).exists(_.isInstanceOf[BaseAggregateExec]),
      s"a per-lang window may only run over the bucket-summary " +
        s"aggregate, not raw docs:\n$w"))
  }

  test("r8 plan shapes: gopher/c4 never hash-shuffle doc rows, bm25 cuts " +
      "top-k via TakeOrderedAndProject, quota's sub-rank windows key " +
      "(lang, bucket) and no window anywhere runs unpartitioned") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    // quality filters: the only exchanges are the fixture-max scalar
    // agg (single partition over one agg row) and the presentation
    // sort — never a hash exchange carrying doc rows
    Seq(
      "gopher" -> graft.ops.llm.QualityFilters.qLlmGopher(spark, sfSmoke),
      "c4" -> graft.ops.llm.QualityFilters.qLlmC4(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      df.collect()
      val hashEx = walk(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e }
      assert(hashEx.isEmpty,
        s"q_llm_$tag must stay a narrow projection — found hash " +
          s"exchanges: ${hashEx.map(_.outputPartitioning)}")
    }
    // bm25: the global cut is a distributed partial top-k, not a
    // whole-frame window
    val bm25 = graft.ops.llm.Ranking.qLlmBm25(spark, sfSmoke)
    bm25.collect()
    assert(bm25.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "bm25 top-20 must compile to TakeOrderedAndProject")
    // interval overlap: the binned decomposition must compile to an
    // EQUI join on the cell key — never the BroadcastNestedLoopJoin a
    // raw theta overlap would produce
    val ij = graft.ops.relational.Joins.qJoinInterval(spark, sfSmoke)
    ij.collect()
    val ijPlan = ij.queryExecution.executedPlan.toString
    assert(!ijPlan.contains("BroadcastNestedLoopJoin"),
      "interval join must bin to an equi join, not a nested loop")
    assert(ijPlan.contains("SortMergeJoin") ||
        ijPlan.contains("ShuffledHashJoin") ||
        ijPlan.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi join on the cell key:\n$ijPlan")
    // spatial radius: same argument in 2-D — the grid-binned join must
    // be an equi join on the cell id, never a distance nested loop
    val sj = graft.ops.relational.Joins.qJoinSpatial(spark, sfSmoke)
    sj.collect()
    val sjPlan = sj.queryExecution.executedPlan.toString
    assert(!sjPlan.contains("BroadcastNestedLoopJoin") &&
        !sjPlan.contains("CartesianProduct"),
      "spatial join must bin to an equi join, not a nested loop")
    assert(sjPlan.contains("SortMergeJoin") ||
        sjPlan.contains("ShuffledHashJoin") ||
        sjPlan.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi join on the cell id:\n$sjPlan")
    // quota + acf: every window partitioned (nothing serializes a
    // stratum into one task); quota's first phase keys (lang, bucket)
    Seq(
      "quota" -> graft.ops.llm.Quota.qLlmQuota(spark, sfSmoke),
      "acf" -> graft.ops.relational.Resample.qTsAcf(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      df.collect()
      val wins = walk(df.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$tag: expected window nodes")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$tag: unpartitioned window — one task would take the " +
          s"whole frame:\n$w"))
      if (tag == "quota")
        assert(wins.exists(_.partitionSpec.size == 2),
          "quota's sub-rank phase must partition by (lang, bucket)")
    }
  }

  test("r11 plan shapes: composed analytics broadcast their bounded dims " +
      "and never nested-loop; EXISTS decorrelates to a semi join; " +
      "attribution windows stay partitioned; rollcorr is join-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    def planOf(tag: String, df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"), s"$tag must not nested-loop:\n$s")
      s
    }
    import graft.ops.relational.Composed
    // Q5/Q10/Q14 shapes: the declared-bounded dims (supplier+nation /
    // nation / part) join as BroadcastHashJoin
    Seq(
      "local_volume" -> Composed.qComposedLocalVolume(spark, sfSmoke),
      "returned" -> Composed.qComposedReturned(spark, sfSmoke),
      "promo_share" -> Composed.qComposedPromoShare(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      val s = planOf(tag, df)
      assert(s.contains("BroadcastHashJoin"),
        s"$tag: bounded dim should broadcast:\n$s")
    }
    planOf("top_orders", Composed.qComposedTopOrders(spark, sfSmoke))
    planOf("nation_trade", Composed.qComposedNationTrade(spark, sfSmoke))
    planOf("disjunct", Composed.qComposedDisjunct(spark, sfSmoke))
    // Q4 shape: EXISTS is a left SEMI join, never a per-row subquery
    val ex = planOf("priority_exists",
      Composed.qComposedPriorityExists(spark, sfSmoke))
    assert(ex.contains("LeftSemi"), s"EXISTS should be a semi join:\n$ex")
    // Q18 shape: the IN-over-aggregate rewrites to a semi join too
    val big = planOf("big_orders",
      Composed.qComposedBigOrders(spark, sfSmoke))
    assert(big.contains("LeftSemi"), s"IN should be a semi join:\n$big")
    // attribution rides asofBackward: its windows partition by the key
    val attr = graft.ops.cdc.Quality.qAttribution(spark, sfSmoke)
    attr.collect()
    val attrWins = walk(attr.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(attrWins.nonEmpty)
    attrWins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"attribution: unpartitioned window:\n$w"))
    // rollcorr: the only window runs over the post-aggregation daily
    // frame — no join anywhere in the plan
    val rc = graft.ops.relational.Resample.qTsRollcorr(spark, sfSmoke)
    rc.collect()
    assert(!walk(rc.queryExecution.executedPlan)
      .exists(_.nodeName.toLowerCase.contains("join")),
      "rollcorr must not join")
    // retention: user-keyed join only — never a loop join
    planOf("retention", graft.ops.cdc.Quality.qRetention(spark, sfSmoke))
  }

  test("r10 plan shapes: nearest as-of and the perceptual near-dups " +
      "never nested-loop; rollback and hashed-features windows/aggs " +
      "stay partitioned and bounded") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    def assertNoLoops(tag: String, df: org.apache.spark.sql.DataFrame): SparkPlan = {
      df.collect()
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") &&
        !s.contains("CartesianProduct"), s"$tag must not nested-loop:\n$s")
      plan
    }
    // nearest as-of: two union+window passes, every window partitioned
    // by the join key — never a theta join
    val near = graft.ops.relational.Joins.qJoinAsofNearest(spark, sfSmoke)
    val nearPlan = assertNoLoops("asof_nearest", near)
    val nearWins = walk(nearPlan).collect { case w: WindowExec => w }
    assert(nearWins.nonEmpty)
    nearWins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"asof_nearest: unpartitioned window:\n$w"))
    // perceptual near-dups (image + audio): banded bucket equi-joins
    assertNoLoops("mm_neardup",
      graft.ops.llm.Multimodal.qMmNeardup(spark, sfSmoke))
    assertNoLoops("mm_audio_neardup",
      graft.ops.llm.Multimodal.qMmAudioNeardup(spark, sfSmoke))
    // rollback: the envelope lag windows partition per key
    val rb = graft.ops.cdc.CdcQueries.qCdcRollback(spark, sfSmoke)
    val rbWins = walk(assertNoLoops("rollback", rb))
      .collect { case w: WindowExec => w }
    assert(rbWins.nonEmpty)
    rbWins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"rollback: unpartitioned window:\n$w"))
    // hashed features: vocabulary-free means NO join anywhere and a
    // bounded shuffle count (the (doc,bucket) agg + the doc pivot +
    // the presentation sort)
    val hf = graft.ops.llm.LlmQueries.qLlmHashedFeatures(spark, sfSmoke)
    hf.collect()
    val hfPlan = walk(hf.queryExecution.executedPlan)
    assert(!hfPlan.exists(_.nodeName.toLowerCase.contains("join")),
      "hashed features must not join (no vocabulary side)")
    val hfShuffles = hfPlan.collect { case e: ShuffleExchangeExec => e }
    assert(hfShuffles.size <= 3,
      s"hashed features: expected <= 3 exchanges, got ${hfShuffles.size}")
  }

  test("r9 plan shapes: salted join is an equi join on (k, salt); " +
      "sample_weighted/vocab_coverage sub-rank windows are partitioned; " +
      "keywords windows per doc; url_canon never shuffles doc rows " +
      "before its one dedup aggregate") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    // salted skew join: ordinary equi join, never a nested loop; the
    // salt must be part of the join key (spreading the hot key)
    val sj = graft.ops.relational.Joins.qJoinSkewSalted(spark, sfSmoke)
    sj.collect()
    val sjPlan = sj.queryExecution.executedPlan.toString
    assert(!sjPlan.contains("BroadcastNestedLoopJoin") &&
        !sjPlan.contains("CartesianProduct"), sjPlan)
    assert(sjPlan.contains("__salt"),
      s"salt column must participate in the join:\n$sjPlan")
    // two-phase top-k pickers: every window partitioned; the sub-rank
    // phase keys (stratum, bucket) / (bucket)
    Seq(
      "sample_weighted" -> graft.ops.llm.Sampling.qLlmSampleWeighted(spark, sfSmoke),
      "keywords" -> graft.ops.llm.CorpusStats.qLlmKeywords(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      df.collect()
      val wins = walk(df.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$tag: expected window nodes")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$tag: unpartitioned window — one task takes the frame:\n$w"))
      if (tag == "sample_weighted")
        assert(wins.exists(_.partitionSpec.size == 2),
          "sample_weighted's sub-rank must partition by (lang, bucket)")
    }
    // vocab_coverage: the one legitimately-global rank sees only the
    // sub-bucket survivors (<= 64k rows), and the sub-rank phase IS
    // partitioned — assert the partitioned window exists and the
    // global one consumes a filtered (srk-capped) child
    val vc = graft.ops.llm.CorpusStats.qLlmVocabCoverage(spark, sfSmoke)
    vc.collect()
    val vcWins = walk(vc.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(vcWins.exists(_.partitionSpec.nonEmpty),
      "vocab_coverage: sub-bucket rank window missing")
    // url_canon: canonicalization stays narrow — the ONLY hash
    // exchange carries the already-canonicalized aggregate, and the
    // regex work never forces a pre-shuffle
    val uc = graft.ops.llm.UrlCanon.qLlmUrlCanon(spark, sfSmoke)
    uc.collect()
    val ucPlan = uc.queryExecution.executedPlan.toString
    assert(ucPlan.contains("HashAggregate"),
      s"url_canon dedup must be a hash aggregate:\n$ucPlan")
  }

  test("dynamic partition pruning: a selective dim filter prunes the " +
      "partitioned fact scan at runtime") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dpp").toString
    // fact partitioned by status — the layout a 100 TB fact table ships
    graft.Tables.table(spark, sfSmoke, "orders")
      .write.partitionBy("o_orderstatus").mode("overwrite")
      .parquet(s"$base/orders_p")
    val fact = spark.read.parquet(s"$base/orders_p")
    // DPP preconditions: a SELECTIVE predicate on the build side that
    // survives optimization (a local Seq folds its filter into the
    // LocalRelation and fails the selectivity check — the dim must be
    // a real scan), and the size-based benefit estimate disabled in
    // favor of the ratio heuristic (tiny test tables would otherwise
    // estimate no benefit — on a real fact table the stats path fires
    // on its own)
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim").filter($"label" === "finished")
    val prior = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val (joined, n) =
      try {
        val j = fact.join(dim, fact("o_orderstatus") === dim("status"))
        (j, j.count())
      } finally prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
        case None => spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      }
    assert(n > 0)
    // the scan must carry a dynamic pruning predicate on the partition
    // column — proof Spark prunes partitions from the dim filter at
    // runtime instead of scanning all three status partitions
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic partition pruning on o_orderstatus:\n$plan")
    // and the pruned count equals the partition's true size
    assert(n === fact.filter($"o_orderstatus" === "F").count())
  }

  test("compactSalted: hot key spreads across (key, salt) reducers") {
    import spark.implicits._
    val log = (0L until 1000L).map(i => (i, 7L, "u", i * 1.0))
      .toDF("lsn", "pk", "op", "val")
    val out = graft.ops.cdc.Cdc.compactSalted(log, Seq("pk"), "lsn", nSalts = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // stage 1 partitions by (pk, __salt) — the hot key occupies 8
    // reducers instead of 1; stage 2 partitions by pk over ≤8 rows/key
    assert(plan.contains("hashpartitioning(pk"), plan)
    assert(plan.contains("__salt"), s"salted stage must partition by salt:\n$plan")
  }

  test("PartitionedUpsert: merge rewrites only touched buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu").toString + "/tgt"
    val snap = (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 16)
    val before = PartitionedUpsert.bucketPaths(spark, dir)
    // changes touching exactly the buckets of keys 3 and 500
    val changes = Seq(
      (10L, 3L, "u", 33.3), (11L, 500L, "d", 0.0), (12L, 2000L, "c", 42.0))
      .toDF("lsn", "pk", "op", "val")
    val touched = PartitionedUpsert.merge(spark, dir, changes,
      "pk", "lsn", "op", Seq("val"), nBuckets = 16)
    val expectedBuckets = Seq(3L, 500L, 2000L)
      .map(k => spark.range(1).select(
        PartitionedUpsert.bucketOf(lit(k), 16)).head().getLong(0)).distinct.sorted
    assert(touched === expectedBuckets)
    // untouched buckets keep their v1 paths (files untouched); touched
    // buckets moved to the new version directory
    val after = PartitionedUpsert.bucketPaths(spark, dir)
    (0L until 16L).filterNot(touched.contains).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    }
    touched.foreach { b =>
      assert(!before.get(b).contains(after.getOrElse(b, "")),
        s"touched bucket $b did not move to a new version")
    }
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === 33.3)
    assert(!state.contains(500L))
    assert(state(2000L) === 42.0)
    assert(state.size === 1000)  // 1000 - 1 deleted + 1 inserted
  }

  test("PartitionedUpsert: compactFiles merges fragmented buckets, " +
      "preserves contents, and keeps time travel across the boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_puc").toString + "/tgt"
    val snap = (0L until 400L).map(i => (i, i * 1.0)).toDF("pk", "val")
    // 8 input tasks × partitionBy(bucket) → ~8 files per bucket dir
    // (the same accretion a 32-shuffle-partition merge write produces
    // in production; AQE coalesces the tiny test merges to one task,
    // so the fragmentation is seeded at init)
    PartitionedUpsert.init(snap.repartition(8), dir, "pk", nBuckets = 2)
    val preVersion = PartitionedUpsert.history(spark, dir).head._1
    val preState = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val preStats = PartitionedUpsert.stats(spark, dir)
    assert(preStats.exists(_._2 > 1), s"fixture not fragmented: $preStats")

    val compacted = PartitionedUpsert.compactFiles(spark, dir,
      maxFilesPerBucket = 1)
    assert(compacted.nonEmpty)
    val postStats = PartitionedUpsert.stats(spark, dir)
    assert(postStats.forall(_._2 == 1),
      s"compaction must leave one file per bucket: $postStats")
    val postState = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(postState === preState, "compaction must not change the data")
    // time travel to the pre-compaction version still resolves
    val travelled = PartitionedUpsert.readVersion(spark, dir, preVersion)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(travelled === preState)
    // idempotent: nothing fragmented now → no-op, no version burned
    val v = PartitionedUpsert.history(spark, dir).head._1
    assert(PartitionedUpsert.compactFiles(spark, dir, 1).isEmpty)
    assert(PartitionedUpsert.history(spark, dir).head._1 === v)
    // and ordinary merges continue against the compacted layout
    PartitionedUpsert.merge(spark, dir,
      Seq((9000L, 7L, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 2)
    assert(PartitionedUpsert.read(spark, dir)
      .filter($"pk" === 7L).head().getDouble(1) === -7.0)
  }

  test("evolveSchema no-op guard: a replayed DDL batch burns no version " +
      "and rewrites nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl2").toString + "/tgt"
    val snap = (0L until 50L).map(i => (i, i.toInt)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)             // v1
    val changes = Seq(
      graft.ops.cdc.Cdc.RenameColumn("val", "amount"),
      graft.ops.cdc.Cdc.WidenColumn("amount",
        org.apache.spark.sql.types.LongType))
    PartitionedUpsert.evolveSchema(spark, dir, changes, "pk", 4)      // v2
    val v = PartitionedUpsert.history(spark, dir).head._1
    // replay: rename finds no 'val', widen is already long → identical
    // schema → must return without a rewrite or a manifest version
    PartitionedUpsert.evolveSchema(spark, dir, changes, "pk", 4)
    assert(PartitionedUpsert.history(spark, dir).head._1 === v,
      "replayed DDL must be a metadata no-op")
    assert(PartitionedUpsert.read(spark, dir).columns.toSeq ===
      Seq("pk", "amount"))
  }

  test("PartitionedUpsert: changesBetween derives the exact row-level CDF " +
      "from manifests, reading only changed buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf").toString + "/tgt"
    val snap = (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 16)          // v1
    val c1 = Seq((10L, 3L, "u", 33.3), (11L, 500L, "d", 0.0),
      (12L, 2000L, "c", 42.0)).toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.merge(spark, dir, c1, "pk", "lsn", "op",
      Seq("val"), 16)                                               // v2
    val c2 = Seq((20L, 3L, "u", 44.4)).toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.merge(spark, dir, c2, "pk", "lsn", "op",
      Seq("val"), 16)                                               // v3
    val cdf12 = PartitionedUpsert.changesBetween(spark, dir, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(cdf12 == Set((3L, "update", Some(33.3)), (500L, "delete", None),
      (2000L, "insert", Some(42.0))), s"v1→v2 CDF wrong: $cdf12")
    // transitive window collapses intermediate states (3: 33.3 → 44.4)
    val cdf13 = PartitionedUpsert.changesBetween(spark, dir, 1L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cdf13 == Set((3L, "update"), (500L, "delete"), (2000L, "insert")))
    // identical versions → empty feed without touching data
    assert(PartitionedUpsert.changesBetween(spark, dir, 2L, 3L)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // compaction rewrites bucket PATHS without changing data — the CDF
    // must not invent changes across that boundary (every compacted
    // bucket is path-changed, so this exercises the row-level diff)
    if (PartitionedUpsert.compactFiles(spark, dir, 1).nonEmpty) {   // v4
      val v = PartitionedUpsert.history(spark, dir).head._1
      assert(PartitionedUpsert.changesBetween(spark, dir, 3L, v).isEmpty,
        "compaction must produce an empty change feed")
    }
    // schema guard: evolve then diff across the boundary must fail loudly
    val preEvolve = PartitionedUpsert.history(spark, dir).head._1
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(graft.ops.cdc.Cdc.RenameColumn("val", "amount")), "pk", 16)
    val err = intercept[IllegalArgumentException] {
      PartitionedUpsert.changesBetween(spark, dir, preEvolve,
        PartitionedUpsert.history(spark, dir).head._1)
    }
    assert(err.getMessage.contains("schema changed"))
  }

  test("PartitionedUpsert: crash between data write and manifest commit " +
      "leaves the old state fully readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu5").toString + "/tgt"
    val snap = (0L until 100L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val changes = Seq((1L, 3L, "u", -3.0), (2L, 7L, "d", 0.0), (3L, 500L, "c", 5.0))
      .toDF("lsn", "pk", "op", "val")
    // "crash": prepare writes all v2 data files but we never commit
    val pending = PartitionedUpsert.prepare(spark, dir, changes,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    assert(new java.io.File(s"$dir/data/${pending.staging}").exists(),
      "prepared data files should be on disk")
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.size === 100 && state(3L) === 3.0 && state.contains(7L),
      "uncommitted merge must be invisible")
    // recovery: re-running the merge (fresh version) converges
    PartitionedUpsert.merge(spark, dir, changes, "pk", "lsn", "op", Seq("val"), 4)
    val recovered = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recovered(3L) === -3.0 && !recovered.contains(7L) && recovered(500L) === 5.0)
  }

  test("PartitionedUpsert: a reader resolved before a merge still sees " +
      "the old snapshot after commit (reader isolation)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu6").toString + "/tgt"
    val snap = (0L until 100L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    // remember the v1 staging dirs by their REAL (uuid-suffixed) names —
    // asserting on a literal "v1" path would be vacuously green
    val v1Dirs = PartitionedUpsert.bucketPaths(spark, dir).values
      .map(p => new java.io.File(p).getParentFile).toSet
    assert(v1Dirs.nonEmpty && v1Dirs.forall(_.exists()))
    val oldReader = PartitionedUpsert.read(spark, dir) // resolves manifest v1
    val changes = (0L until 100L).map(i => (i + 1L, i, "u", -1.0))
      .toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.merge(spark, dir, changes, "pk", "lsn", "op", Seq("val"), 4)
    // v1 files are never touched by the merge, so the old plan executes
    // against a consistent snapshot — no torn read
    assert(oldReader.agg(sum($"val")).head().getDouble(0) === (0 until 100).sum.toDouble)
    assert(PartitionedUpsert.read(spark, dir).agg(sum($"val")).head().getDouble(0) === -100.0)
    // vacuum(keep=1, age=0) reclaims the v1 staging dirs; state unaffected
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1, minStagingAgeMs = 0)
    assert(v1Dirs.forall(!_.exists()), s"vacuum should reclaim $v1Dirs")
    assert(PartitionedUpsert.read(spark, dir).count() === 100)
  }

  test("vacuum never reclaims an in-flight prepare; crashed orphans go " +
      "after the next commit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu8").toString + "/tgt"
    val snap = (0L until 50L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val c1 = Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val")
    // stage a merge but do NOT commit — then vacuum aggressively (the
    // default minStagingAgeMs shields anything younger than an hour)
    val pending = PartitionedUpsert.prepare(spark, dir, c1,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1)
    assert(new java.io.File(s"$dir/data/${pending.staging}").exists(),
      "vacuum must not reclaim a staged-but-uncommitted version")
    PartitionedUpsert.commit(spark, dir, pending)
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === -3.0, "commit after vacuum must publish intact data")
    // a crashed prepare's orphan IS reclaimed once a later commit lands
    val orphan = PartitionedUpsert.prepare(spark, dir,
      Seq((2L, 5L, "u", 5.5)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4) // never committed
    PartitionedUpsert.merge(spark, dir,
      Seq((3L, 6L, "u", 6.6)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    // age 0 simulates an orphan older than the retention window
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1, minStagingAgeMs = 0)
    assert(!new java.io.File(s"$dir/data/${orphan.staging}").exists(),
      "an aged unreachable orphan must be reclaimed")
    assert(PartitionedUpsert.read(spark, dir).count() === 50)
  }

  test("re-init of an initialized target fails BEFORE touching any committed data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu11").toString + "/tgt"
    val snap = (0L until 30L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    val before = PartitionedUpsert.bucketPaths(spark, dir)
    intercept[IllegalStateException] {
      PartitionedUpsert.init(
        Seq((9L, 999.0)).toDF("pk", "val"), dir, "pk", nBuckets = 4)
    }
    // the live table is untouched: same manifest, same files, same data
    assert(PartitionedUpsert.bucketPaths(spark, dir) === before)
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.size === 30 && state(3L) === -3.0)
  }

  test("time travel: readVersion pins historical snapshots; history lists commits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu10").toString + "/tgt"
    val snap = (0L until 20L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    PartitionedUpsert.merge(spark, dir,
      Seq((2L, 3L, "d", 0.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    def valAt(v: Long) = PartitionedUpsert.readVersion(spark, dir, v)
      .filter($"pk" === 3L).collect().map(_.getDouble(1)).toSeq
    assert(valAt(1L) === Seq(3.0))   // initial snapshot
    assert(valAt(2L) === Seq(-3.0))  // after the update
    assert(valAt(3L) === Seq())      // after the delete
    val hist = PartitionedUpsert.history(spark, dir)
    assert(hist.map(_._1) === Seq(3L, 2L, 1L), s"history: $hist")
    intercept[IllegalArgumentException] {
      PartitionedUpsert.readVersion(spark, dir, 99L)
    }
  }

  test("concurrent merges from the same base: a SAME-KEY loser gets a " +
      "commit conflict (no lost update); key-disjoint racers compose " +
      "(r19 key-level rebase)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu9").toString + "/tgt"
    val snap = (0L until 50L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val changesA = Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val")
    // B updates the SAME key — the one overlap no rebase may compose
    val changesB = Seq((2L, 3L, "u", -4.0)).toDF("lsn", "pk", "op", "val")
    // both writers prepare from the SAME base manifest
    val a = PartitionedUpsert.prepare(spark, dir, changesA,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    val b = PartitionedUpsert.prepare(spark, dir, changesB,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    PartitionedUpsert.commit(spark, dir, a)
    // b would silently drop a's update if it committed blind — it must
    // fail (the bucket-level check flags it, the key-level rebase
    // proves the overlap is genuine and rethrows)
    intercept[java.util.ConcurrentModificationException] {
      PartitionedUpsert.commit(spark, dir, b)
    }
    // the loser retries from the NEW state and last-write-wins applies
    PartitionedUpsert.merge(spark, dir, changesB,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === -4.0 && state.size === 50, s"lost update: $state")
    // key-DISJOINT racers from one base both land (ConflictRebaseSpec
    // proves the compose in depth; this pins the scale contract)
    val c = PartitionedUpsert.prepare(spark, dir,
      Seq((3L, 7L, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    val d = PartitionedUpsert.prepare(spark, dir,
      Seq((4L, 11L, "u", -11.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    PartitionedUpsert.commit(spark, dir, c)
    PartitionedUpsert.commit(spark, dir, d) // composes, never lost
    val st2 = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(st2(7L) === -7.0 && st2(11L) === -11.0, s"lost compose: $st2")
  }

  test("PartitionedUpsert.evolveSchema: rename+widen rewrite commits atomically " +
      "and post-DDL merges apply in the new schema") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu7").toString + "/tgt"
    val snap = (0L until 50L).map(i => (i, i.toInt)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(graft.ops.cdc.Cdc.RenameColumn("val", "amount"),
          graft.ops.cdc.Cdc.WidenColumn("amount", LongType)),
      "pk", nBuckets = 4)
    val evolved = PartitionedUpsert.read(spark, dir)
    assert(evolved.schema("amount").dataType === LongType)
    assert(evolved.count() === 50)
    assert(evolved.filter($"pk" === 7L).head().getLong(1) === 7L)
    // post-DDL merge speaks the new schema, incl. values beyond int range
    val changes = Seq((1L, 7L, "u", 3000000000L), (2L, 100L, "c", 5L))
      .toDF("lsn", "pk", "op", "amount")
    PartitionedUpsert.merge(spark, dir, changes, "pk", "lsn", "op",
      Seq("amount"), nBuckets = 4)
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state(7L) === 3000000000L && state(100L) === 5L && state.size === 51)
  }

  test("PartitionedUpsert.merge is O(1) Spark jobs, not O(touched buckets)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu3").toString + "/tgt"
    val snap = (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 16)
    // changes spread over (almost) every bucket
    val changes = (0L until 64L).map(i => (100L + i, i * 16L, "u", -1.0))
      .toDF("lsn", "pk", "op", "val")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val touched = PartitionedUpsert.merge(spark, dir, changes,
        "pk", "lsn", "op", Seq("val"), nBuckets = 16)
      Thread.sleep(1000) // listener events are async; margin is 48-vs-12
      assert(touched.size >= 10, s"want a many-bucket batch, got $touched")
      // the old per-bucket loop ran 3 jobs per touched bucket (~48 here);
      // the single-pass merge is a small constant regardless of fan-out
      // (~10 observed: AQE materializes each shuffle stage as a job)
      assert(jobs <= 12, s"merge ran $jobs jobs for ${touched.size} buckets")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("PartitionedUpsert.merge drops a bucket directory emptied by deletes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu4").toString + "/tgt"
    val keys = (0L until 16L)
    val snap = keys.map(k => (k, 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val bucketOfKey = keys.map { k =>
      k -> spark.range(1).select(PartitionedUpsert.bucketOf(lit(k), 4))
        .head().getLong(0)
    }.toMap
    // delete every key living in key 7's bucket → that bucket empties
    val b = bucketOfKey(7L)
    val toDelete = keys.filter(bucketOfKey(_) == b)
    assert(PartitionedUpsert.bucketPaths(spark, dir).contains(b))
    val changes = toDelete.zipWithIndex
      .map { case (k, i) => (i.toLong + 1L, k, "d", 0.0) }
      .toDF("lsn", "pk", "op", "val")
    PartitionedUpsert.merge(spark, dir, changes, "pk", "lsn", "op", Seq("val"), 4)
    assert(!PartitionedUpsert.bucketPaths(spark, dir).contains(b),
      "emptied bucket must vanish from the manifest (omission, not deletion)")
    assert(PartitionedUpsert.read(spark, dir).count() === 16L - toDelete.size)
  }

  test("PartitionedUpsert converges to batch Cdc.apply on the corpus log") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pu2").toString + "/tgt"
    val snap = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select($"c_custkey".as("pk"), $"c_acctbal".as("val"))
    val log = graft.ops.cdc.CdcQueries.changeLog(spark, sfSmoke)
      .withColumnRenamed("after_value", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 8)
    PartitionedUpsert.merge(spark, dir, log, "pk", "lsn", "op", Seq("val"), 8)
    val viaBuckets = PartitionedUpsert.read(spark, dir)
    val viaBatch = graft.ops.cdc.Cdc.apply(snap, log, Seq("pk"), "lsn", "op", Seq("val"))
      .drop("src")
    assert(viaBuckets.exceptAll(viaBatch).isEmpty &&
      viaBatch.exceptAll(viaBuckets).isEmpty)
  }

  test("rebucket: atomic bucket-count evolution — state preserved, merges " +
      "continue at the new count, time travel crosses the boundary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rb").toString + "/tgt"
    val snap = (0L until 500L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)               // v1
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)                      // v2
    PartitionedUpsert.rebucket(spark, dir, "pk", newBuckets = 16)       // v3
    // state survives the rewrite bit-for-bit
    val after = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after.size === 500 && after(3L) === -3.0)
    // the physical layout really did split: more distinct buckets than 4
    assert(PartitionedUpsert.bucketPaths(spark, dir).keySet.size > 4)
    // merges continue at the NEW count on the same code path...
    PartitionedUpsert.merge(spark, dir,
      Seq((2L, 7L, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 16)                     // v4
    assert(PartitionedUpsert.read(spark, dir)
      .filter($"pk" === 7L).head().getDouble(1) === -7.0)
    // ...and the STALE count is rejected before touching anything: a
    // mismatched modulus would route keys to the wrong files
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.merge(spark, dir,
        Seq((3L, 9L, "u", -9.0)).toDF("lsn", "pk", "op", "val"),
        "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    }
    assert(e.getMessage.contains("rebucket"))
    // time travel across the rebucket boundary resolves old manifests
    // (each manifest pins its own layout)
    assert(PartitionedUpsert.readVersion(spark, dir, 2L)
      .filter($"pk" === 7L).head().getDouble(1) === 7.0)
    assert(PartitionedUpsert.readVersion(spark, dir, 1L)
      .filter($"pk" === 3L).head().getDouble(1) === 3.0)
    val hist = PartitionedUpsert.history(spark, dir)
    assert(hist.map(_._1) === Seq(4L, 3L, 2L, 1L), s"history: $hist")
  }

  test("prepare rejects a change batch whose value type promotes past the " +
      "table schema — fail fast, never a bricked table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sv").toString + "/tgt"
    val snap = (0L until 50L).map(i => (i, i.toInt)).toDF("pk", "val") // val: int
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val before = PartitionedUpsert.bucketPaths(spark, dir)
    // double changes onto an int table: the merged column promotes to
    // double — staging it would diverge parquet physical types from the
    // manifest schema and every later read of those buckets would fail
    val badBatch = Seq((1L, 3L, "u", 3.5)).toDF("lsn", "pk", "op", "val")
    val e = intercept[IllegalArgumentException] {
      PartitionedUpsert.merge(spark, dir, badBatch,
        "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    }
    assert(e.getMessage.contains("evolveSchema"))
    // nothing was committed; the table reads fine and is unchanged
    assert(PartitionedUpsert.bucketPaths(spark, dir) === before)
    assert(PartitionedUpsert.read(spark, dir).count() === 50)
    // the migration path works: widen first, then the double batch lands
    PartitionedUpsert.evolveSchema(spark, dir,
      Seq(graft.ops.cdc.Cdc.WidenColumn("val",
        org.apache.spark.sql.types.DoubleType)), "pk", nBuckets = 4)
    PartitionedUpsert.merge(spark, dir, badBatch,
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)
    assert(PartitionedUpsert.read(spark, dir)
      .filter($"pk" === 3L).head().getDouble(1) === 3.5)
  }

  test("merge with txn (appId, version): a replayed batch is a metadata " +
      "no-op — no version burn, no rewrite, no double apply") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_txn").toString + "/tgt"
    val snap = (0L until 100L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)               // v1
    val batch1 = Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val")
    val t1 = PartitionedUpsert.merge(spark, dir, batch1,
      "pk", "lsn", "op", Seq("val"), 4, txn = Some(("ckpt-A", 0L)))     // v2
    assert(t1.nonEmpty)
    val m2 = PartitionedUpsert.currentManifest(spark, dir).get
    val paths2 = PartitionedUpsert.bucketPaths(spark, dir)
    // the crash-replay shape: same (app, version) delivered again —
    // recognized from the manifest, nothing read or written
    val replay = PartitionedUpsert.merge(spark, dir, batch1,
      "pk", "lsn", "op", Seq("val"), 4, txn = Some(("ckpt-A", 0L)))
    assert(replay.isEmpty, "replayed txn must be skipped")
    assert(PartitionedUpsert.currentManifest(spark, dir).get.version === m2.version,
      "a replay must not burn a table version")
    assert(PartitionedUpsert.bucketPaths(spark, dir) === paths2,
      "a replay must not rewrite any bucket")
    // the NEXT batch of the same app applies; other apps are independent
    val t3 = PartitionedUpsert.merge(spark, dir,
      Seq((2L, 5L, "u", -5.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 4, txn = Some(("ckpt-A", 1L)))     // v3
    assert(t3.nonEmpty)
    val t4 = PartitionedUpsert.merge(spark, dir,
      Seq((3L, 7L, "u", -7.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), 4, txn = Some(("ckpt-B", 0L)))     // v4
    assert(t4.nonEmpty)
    val state = PartitionedUpsert.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state(3L) === -3.0 && state(5L) === -5.0 && state(7L) === -7.0)
    assert(PartitionedUpsert.currentManifest(spark, dir).get.txns ===
      Map("ckpt-A" -> 1L, "ckpt-B" -> 0L))
    // prepare refuses an already-applied txn outright (merge is the
    // API that turns replays into no-ops)
    intercept[IllegalArgumentException] {
      PartitionedUpsert.prepare(spark, dir, batch1,
        "pk", "lsn", "op", Seq("val"), 4, txn = Some(("ckpt-A", 1L)))
    }
  }

  test("manifest records the bucket key column: a drifted caller is " +
      "rejected before touching anything") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kd").toString + "/tgt"
    val snap = (0L until 20L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      // 'val' exists as a column, so only the manifest can catch this
      PartitionedUpsert.merge(spark, dir,
        Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val"),
        "val", "lsn", "op", Seq("pk"), 4)
    }
    assert(e.getMessage.contains("bucketed by 'pk'"))
    assert(PartitionedUpsert.read(spark, dir).count() === 20)
  }

  test("composite-key upsert via a struct surrogate: bucketOf hashes the " +
      "struct, Cdc.apply joins on it — the documented composite pattern") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString + "/tgt"
    // composite PK (region, id) packed into ONE struct column
    val snap = (for { r <- Seq("eu", "us"); i <- 0L until 50L } yield (r, i, 1.0))
      .toDF("region", "id", "val")
      .select(struct($"region", $"id").as("ck"), $"val")
    PartitionedUpsert.init(snap, dir, "ck", nBuckets = 4)
    val changes = Seq(("eu", 7L, "u", 77.0), ("us", 7L, "d", 0.0),
        ("ap", 1L, "c", 9.0))
      .toDF("region", "id", "op", "v")
      .select(monotonically_increasing_id().as("lsn"),
        struct($"region", $"id").as("ck"), $"op", $"v".as("val"))
    PartitionedUpsert.merge(spark, dir, changes, "ck", "lsn", "op", Seq("val"), 4)
    val state = PartitionedUpsert.read(spark, dir)
      .select($"ck.region", $"ck.id", $"val")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(state(("eu", 7L)) === 77.0, "only the (eu,7) half of the pair updates")
    assert(!state.contains(("us", 7L)), "(us,7) tombstoned independently")
    assert(state(("ap", 1L)) === 9.0)
    assert(state.size === 100 - 1 + 1)
  }

  test("vacuum age-guards manifest deletion: a just-superseded version " +
      "stays time-travelable until the retention window lapses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vg").toString + "/tgt"
    val snap = (0L until 20L).map(i => (i, i * 1.0)).toDF("pk", "val")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)               // v1
    PartitionedUpsert.merge(spark, dir,
      Seq((1L, 3L, "u", -3.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)                      // v2
    PartitionedUpsert.merge(spark, dir,
      Seq((2L, 3L, "u", 33.0)).toDF("lsn", "pk", "op", "val"),
      "pk", "lsn", "op", Seq("val"), nBuckets = 4)                      // v3
    // two quick commits + aggressive vacuum: with the default retention
    // window the young superseded manifests (and their data) survive —
    // a reader that just resolved v1/v2 cannot lose them
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1)
    assert(PartitionedUpsert.readVersion(spark, dir, 1L)
      .filter($"pk" === 3L).head().getDouble(1) === 3.0)
    assert(PartitionedUpsert.readVersion(spark, dir, 2L)
      .filter($"pk" === 3L).head().getDouble(1) === -3.0)
    // once aged past the window they are reclaimed uniformly
    PartitionedUpsert.vacuum(spark, dir, keepManifests = 1, minStagingAgeMs = 0)
    intercept[IllegalArgumentException] {
      PartitionedUpsert.readVersion(spark, dir, 1L)
    }
    assert(PartitionedUpsert.read(spark, dir)
      .filter($"pk" === 3L).head().getDouble(1) === 33.0)
  }

  test("graph hub skew is HANDLED, not claimed: AQE splits the pagerank " +
       "rank-join's hot src partition; degree orientation gives the " +
       "triangle hub zero wedges") {
    import spark.implicits._
    // ---- pagerank: the per-iteration ew ⋈ ranks join on src is the
    // Zipf-hub AQE-skew case Graph.qGraphPagerank documents. Plant the
    // hub (one src owns ~77% of edge rows), pad rows with
    // non-compressible bytes so the skew exists in BYTES (what AQE
    // measures), lower the thresholds the way the smoke does (prod
    // defaults fire unchanged at real partition sizes), and assert the
    // executed adaptive plan carries the skew=true annotation.
    val pad = concat((0 until 8).map(i =>
      sha2(concat(lit(s"p$i"), $"id".cast("string")), 256)): _*)
    val hub = spark.range(100000)
      .select(lit("sHUB").as("src"), concat(lit("c"), $"id").as("dst"),
        lit(1L).as("w"), pad.as("p"))
    val rest = spark.range(30000)
      .select(concat(lit("s"), $"id" % 3000).as("src"),
        concat(lit("c"), $"id").as("dst"), lit(1L).as("w"), pad.as("p"))
    val edges = hub.unionAll(rest).localCheckpoint()
    val ew = edges.join(
      edges.groupBy($"src").agg(sum($"w").as("ow")), "src").localCheckpoint()
    // checkpointed like qGraphPagerank's nodes frame — an inline
    // distinct leaves a HashAggregate between the join's Sort and the
    // shuffle stage, which breaks OptimizeSkewedJoin's
    // SMJ(Sort(Shuffle), Sort(Shuffle)) pattern match
    val ranks = edges.select($"src".as("node")).distinct()
      .select($"node", lit(0.001).as("r")).localCheckpoint()
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the pad must be CONSUMED downstream or column pruning strips it
      // from the shuffle and the hot partition compresses to nothing
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst".as("node"), ($"r" * $"w" / $"ow").as("c"), $"p")
        .groupBy($"node").agg(sum($"c").as("c"), max($"p").as("m"))
      // collect() (not count()) so this SAME QueryExecution runs and
      // its final adaptive plan carries the skew annotations
      assert(contrib.collect().length === 100000) // dsts c0..c99999 overlap
      val plan = contrib.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage on the planted hub:\n$plan")
    } finally confs.keys.foreach(spark.conf.unset)

    // ---- triangles: the wedge self-join needs NO skew handling — the
    // documented reason is the orientation bound, so measure it. A
    // 5000-spoke star hub (+ a ring so spokes have degree >= 2): the
    // hub is every edge's higher-degree endpoint, so all its edges
    // orient INTO it — oriented out-degree 0, zero wedge fan-out.
    // Naive id-orientation (hub id 0 smaller than every spoke) would
    // give out-degree 5000 => ~12.5M hub wedges.
    val star = spark.range(1, 5001).select(lit(0L).as("u"), $"id".as("v"))
    val ring = spark.range(1, 5000).select($"id".as("u"), ($"id" + 1).as("v"))
    val oe = graft.ops.relational.Graph.orientByDegree(star.unionAll(ring))
    val outDeg = oe.groupBy($"s").agg(count(lit(1)).as("od")).localCheckpoint()
    assert(outDeg.filter($"s" === 0L).isEmpty, "hub must have out-degree 0")
    val maxOut = outDeg.agg(max($"od")).head().getLong(0)
    assert(maxOut <= 3L,
      s"oriented out-degree must stay O(sqrt E) on a 5000-degree hub, got $maxOut")
    // wedge fan-out sum od*(od-1)/2: bounded vs the naive orientation's
    val fanOut = outDeg.agg(sum($"od" * ($"od" - 1))).head().getLong(0) / 2
    val naiveHubFanOut = 5000L * 4999L / 2
    assert(fanOut < naiveHubFanOut / 100,
      s"degree-oriented wedge volume $fanOut should be orders of magnitude " +
        s"under the naive hub's $naiveHubFanOut")
  }

  test("maintained stats drive the broadcast decision: BroadcastHashJoin " +
      "from stats alone — AQE off, size-based broadcast disabled") {
    import spark.implicits._
    import graft.ops.cdc.StatsMaintain
    val base = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    val (dimDir, statsDir) = (s"$base/dim", s"$base/stats")
    PartitionedUpsert.init(
      (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name"),
      dimDir, "k", nBuckets = 4)
    StatsMaintain.init(spark, dimDir, statsDir, Seq("k"))
    val fact = (0 until 1000).map(i => (i % 100L, i.toLong)).toDF("k", "payload")
    val (aqe, thr) = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    // the foreachBatch posture: no AQE runtime rescue, and Spark's own
    // size-based broadcast OFF — only an explicit hint can broadcast,
    // so a BHJ here is attributable to the maintained profile alone
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(dim: org.apache.spark.sql.DataFrame) =
        fact.join(dim, "k").queryExecution.executedPlan.toString
      // control: without the stats-fed hint the join cannot broadcast
      assert(!planOf(PartitionedUpsert.read(spark, dimDir))
        .contains("BroadcastHashJoin"),
        "control join must not broadcast with the size rule disabled")
      // 100 rows x ~28B width clears a 1 MiB dial -> hint -> BHJ
      assert(planOf(StatsMaintain.readWithStats(spark, dimDir, statsDir,
        threshold = Some(1L << 20))).contains("BroadcastHashJoin"),
        "maintained rowCount must produce the broadcast hint")
      // an estimate OVER the dial withholds the hint — the decision is
      // really coming from rows x width vs threshold
      assert(!planOf(StatsMaintain.readWithStats(spark, dimDir, statsDir,
        threshold = Some(10L))).contains("BroadcastHashJoin"),
        "a too-small threshold must withhold the hint")
      // session default path: threshold sentinel -1 -> never hint
      assert(!planOf(StatsMaintain.readWithStats(spark, dimDir, statsDir))
        .contains("BroadcastHashJoin"),
        "the disabled sentinel must mean no stats-fed hint either")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("r12 plan shapes: the Q2/6/8/9/11/12/15/16/17/20/21 composed " +
      "family broadcasts bounded dims, pushes Q6's three predicates " +
      "into the scan, decorrelates the semi-join chains, and confines " +
      "scalar-threshold cross joins to single-row broadcasts") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(walk)
    }
    def planOf(tag: String, df: org.apache.spark.sql.DataFrame,
        allowSingleRowNlj: Boolean = false): String = {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("CartesianProduct"), s"$tag cartesians:\n$s")
      if (!allowSingleRowNlj)
        assert(!s.contains("BroadcastNestedLoopJoin"),
          s"$tag must not nested-loop:\n$s")
      s
    }
    import graft.ops.relational.Composed2
    // multi-dim joins: every bounded dim a BroadcastHashJoin
    Seq(
      "min_cost" -> Composed2.qComposedMinCost(spark, sfSmoke),
      "mktshare" -> Composed2.qComposedMktshare(spark, sfSmoke),
      "profit" -> Composed2.qComposedProfit(spark, sfSmoke),
      "partsupp_cnt" -> Composed2.qComposedPartsuppCnt(spark, sfSmoke),
      "small_qty" -> Composed2.qComposedSmallQty(spark, sfSmoke),
      "waiting" -> Composed2.qComposedWaiting(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      val s = planOf(tag, df)
      assert(s.contains("BroadcastHashJoin"),
        s"$tag: bounded dim should broadcast:\n$s")
    }
    // Q6 shape: all three predicates reach the parquet reader
    val fc = Composed2.qComposedForecast(spark, sfSmoke)
    fc.collect()
    val scan = walk(fc.queryExecution.executedPlan)
      .map(_.toString).filter(_.contains("PushedFilters"))
      .mkString("\n")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(scan.contains(c),
        s"forecast: $c must be pushed to the scan:\n$scan"))
    // Q20 shape: the nested-IN chain decorrelates to semi joins
    val ex = planOf("excess_supply",
      Composed2.qComposedExcessSupply(spark, sfSmoke))
    assert(ex.contains("LeftSemi"), s"Q20 chain should semi-join:\n$ex")
    // Q12 late-split: no window, no subquery — one join + one agg
    planOf("priority_late", Composed2.qComposedPriorityLate(spark, sfSmoke))
    // scalar-threshold shapes: the single-row aggregate side arrives
    // broadcast (BroadcastNestedLoopJoin over ONE row is a constant
    // append, not a blow-up); nothing else may nested-loop
    Seq(
      "important_stock" -> Composed2.qComposedImportantStock(spark, sfSmoke),
      "top_supplier" -> Composed2.qComposedTopSupplier(spark, sfSmoke)
    ).foreach { case (tag, df) =>
      val s = planOf(tag, df, allowSingleRowNlj = true)
      if (s.contains("BroadcastNestedLoopJoin"))
        assert(s.contains("BroadcastExchange"),
          s"$tag: the scalar side must broadcast:\n$s")
    }
  }

  test("runtime bloom filter: a selective dim-side filter injects a " +
      "bloom probe into the fact side of a shuffle join (the 100 TB " +
      "mechanism that prunes fact rows BEFORE the shuffle), result " +
      "unchanged") {
    import spark.implicits._
    val enabled = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled")
    val appThr = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val bcThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // optional bytes conf: an empty-string default fails validation,
    // so probe with Try instead of a sentinel default
    val aqeBcThr = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    try {
      // local parquet is far below the 10 GB default application-side
      // threshold — drop it to 0 so the local plan exercises the same
      // injection a 100 TB scan gets for free
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // and force the join to SHUFFLE: runtime filters exist for the
      // dim-too-big-to-broadcast case (a broadcast join prunes by
      // itself) — at test scale every dim fits, so disable broadcast
      // to reproduce the 100 TB join shape
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      val ord = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT" &&
          $"o_totalprice" > 400000.0)
      def q() = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val on = q()
      val rowsOn = on.collect().toSeq
      val plan = on.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter") ||
        plan.contains("might_contain"),
        s"expected a runtime bloom probe on the fact side:\n$plan")

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val rowsOff = q().collect().toSeq
      assert(rowsOn.map(_.toString).sorted === rowsOff.map(_.toString).sorted,
        "runtime filtering must not change results")
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", enabled)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", appThr)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThr)
      aqeBcThr match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("hyperplane LSH finds planted cosine near-duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0L until 50L).map(i => (i, vec()))
    // plant near-dups: ids 1000+i are tiny perturbations of i (0..4)
    val dups = (0L until 5L).map(i =>
      (1000L + i, base(i.toInt)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat)))
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val found = Knn.cosineNearDups(corpus, dim = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(found.contains((i, 1000L + i)), s"missing pair $i"))
    // verified precision: every reported pair truly has cosine >= 0.99
    Knn.cosineNearDups(corpus, 16, 0.99)
      .collect().foreach(r => assert(r.getDouble(2) >= 0.99))
  }
  test("MergeInto.resolve: the dup-guard window's exchange is REUSED " +
      "by the full-outer join - exactly one shuffle per side, no BNLJ") {
    import spark.implicits._
    import graft.ops.cdc.MergeInto
    val tgt = (0L until 1000L).map(k => (k, k * 10L, "t")).toDF("k", "bal", "tag")
    val src = (500L until 1500L).map(k => (k, k + 1L)).toDF("k", "add")
    val out = MergeInto.into(tgt, src, Seq("k"))
      .whenMatchedUpdate(Map("bal" -> ($"t.bal" + $"s.add")))
      .whenNotMatchedInsert(Map("k" -> $"s.k", "bal" -> $"s.add",
        "tag" -> lit("new")))
      .resolve()
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"merge should shuffle once per side (window exchange reused):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("registerView: SQL over the upsert table sees a consistent " +
      "snapshot; versionAsOf pins history; later merges invisible " +
      "until re-registered") {
    import spark.implicits._
    import graft.ops.cdc.PartitionedUpsert
    val dir = java.nio.file.Files.createTempDirectory("graft_view").toString
    val snap = (0L until 50L).map(k => (k, k * 2L)).toDF("pk", "v")
    PartitionedUpsert.init(snap, dir, "pk", nBuckets = 4)
    PartitionedUpsert.registerView(spark, dir, "t_view")
    assert(spark.sql("SELECT count(*) n, sum(v) s FROM t_view")
      .head().toSeq === Seq(50L, 2450L))
    // merge after registration: the view still reads the old snapshot
    val ch = Seq(("u", 1L, 0L, 999L)).toDF("op", "lsn", "pk", "v")
    PartitionedUpsert.merge(spark, dir, ch, "pk", "lsn", "op", Seq("v"), 4)
    assert(spark.sql("SELECT sum(v) s FROM t_view").head().getLong(0)
      === 2450L, "view must be the registration-time snapshot")
    // re-register -> current state; versionAsOf -> pinned history
    PartitionedUpsert.registerView(spark, dir, "t_view")
    assert(spark.sql("SELECT sum(v) s FROM t_view").head().getLong(0)
      === 2450L + 999L)
    PartitionedUpsert.registerView(spark, dir, "t_v1", versionAsOf = Some(1L))
    assert(spark.sql("SELECT sum(v) s FROM t_v1").head().getLong(0)
      === 2450L)
    // full SQL parity: a windowed CTE over the view
    val top = spark.sql(
      """WITH r AS (SELECT pk, v, row_number() OVER (ORDER BY v DESC) rk
        |FROM t_view) SELECT pk FROM r WHERE rk = 1""".stripMargin)
      .head().getLong(0)
    assert(top === 0L) // pk 0 now holds v=999
  }

}
