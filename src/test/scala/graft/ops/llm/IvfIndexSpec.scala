package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF index: search equals the in-memory ivfTopK on the
  * same codebook, append is assign-only and keeps the equivalence,
  * retrain is an explicit versioned operation with working time
  * travel, and the probed read prunes to the probed cid partitions. */
class IvfIndexSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("search == in-memory ivfTopK on the same codebook (build + reopen)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val queries = emb.filter(col("vec_id") < 15)
    IvfIndex.build(emb, dir, dim = 64, k = 8, iters = 3)
    val cents = IvfIndex.codebook(spark, dir) // round-tripped via manifest
    val mem = Knn.ivfTopK(queries, emb, cents, k = 5, nprobe = 2)
    val idx = IvfIndex.search(spark, dir, queries, k = 5, nprobe = 2)
    assert(pairs(idx) === pairs(mem))
    // round-trip exactness: the reopened codebook IS the trained one
    val trained = Knn.ivfCentroids(emb, dim = 64, k = 8, iters = 3)
    assert(cents.map(_.toSeq).toSeq === trained.map(_.toSeq).toSeq)
  }

  test("append is assign-only: search over the grown index equals " +
      "ivfTopK over the full corpus under the ORIGINAL codebook") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ap").toString + "/idx"
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    IvfIndex.build(first, dir, dim = 64, k = 8, iters = 3)
    val cents = IvfIndex.codebook(spark, dir)
    IvfIndex.append(spark, dir, rest)
    // codebook unchanged by append
    assert(IvfIndex.codebook(spark, dir).map(_.toSeq).toSeq ===
      cents.map(_.toSeq).toSeq)
    val queries = emb.filter(col("vec_id") < 15)
    val idx = IvfIndex.search(spark, dir, queries, k = 5, nprobe = 3)
    val mem = Knn.ivfTopK(queries, emb, cents, k = 5, nprobe = 3)
    assert(pairs(idx) === pairs(mem))
    // recall invariant: appended vectors are findable
    val appendedHits = idx.join(rest.select(col("vec_id").as("c_vec_id")),
      "c_vec_id").count()
    assert(appendedHits > 0, "appended vectors must appear in results")
  }

  test("retrain is a versioned operation; time travel searches the OLD " +
      "codebook against the OLD files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString + "/idx"
    val queries = emb.filter(col("vec_id") < 10)
    IvfIndex.build(emb, dir, dim = 64, k = 4, iters = 2)
    val v1 = IvfIndex.history(spark, dir).head
    val preRetrain = pairs(IvfIndex.search(spark, dir, queries, 5, 2))
    IvfIndex.retrain(spark, dir, k = 8, iters = 3)
    val hist = IvfIndex.history(spark, dir)
    assert(hist.length === 2 && hist.head === v1 + 1)
    assert(IvfIndex.codebook(spark, dir).length === 8)
    // current search runs under the NEW codebook and stays correct:
    // probe-all == brute force over the stored vectors
    val brute = Knn.bruteForceTopK(queries, emb, 5)
    val probeAll = IvfIndex.search(spark, dir, queries, 5, nprobe = 8)
    assert(pairs(probeAll) === pairs(brute))
    // time travel: v1's codebook + v1's files reproduce the old results
    assert(pairs(IvfIndex.searchVersion(spark, dir, v1, queries, 5, 2))
      === preRetrain)
  }

  test("compactIndex collapses append-accumulated files; results and " +
      "codebook unchanged; vacuum reclaims aged unreachable stagings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cv").toString + "/idx"
    val parts = (0 until 4).map(i => emb.filter(col("vec_id") % 4 === i))
    IvfIndex.build(parts.head, dir, dim = 64, k = 4, iters = 2)
    parts.tail.foreach(p => IvfIndex.append(spark, dir, p))
    val queries = emb.filter(col("vec_id") < 10)
    val pre = pairs(IvfIndex.search(spark, dir, queries, 5, 4))
    val cents = IvfIndex.codebook(spark, dir)
    val compacted = IvfIndex.compactIndex(spark, dir, maxFilesPerCid = 1)
    assert(compacted.nonEmpty, "3 appends must fragment at least one cid")
    // one path entry per compacted cid now; data and codebook unchanged
    val m = IvfIndex.currentManifest(spark, dir).get
    compacted.foreach(cid => assert(m.paths(cid).length === 1))
    assert(m.centroids.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
    assert(pairs(IvfIndex.search(spark, dir, queries, 5, 4)) === pre)
    // idempotent: nothing fragmented now → no version burned
    val v = IvfIndex.history(spark, dir).head
    assert(IvfIndex.compactIndex(spark, dir, 1).isEmpty)
    assert(IvfIndex.history(spark, dir).head === v)
    // vacuum with age-guard up: everything survives (in-flight safety)
    IvfIndex.vacuum(spark, dir, keepManifests = 1)
    assert(IvfIndex.history(spark, dir).length >= 2)
    assert(pairs(IvfIndex.search(spark, dir, queries, 5, 4)) === pre)
    // aged-out: only the newest version survives, old stagings go,
    // current search still answers identically
    IvfIndex.vacuum(spark, dir, keepManifests = 1, minStagingAgeMs = 0L)
    assert(IvfIndex.history(spark, dir) === Seq(v))
    assert(pairs(IvfIndex.search(spark, dir, queries, 5, 4)) === pre)
    intercept[IllegalArgumentException] {
      IvfIndex.searchVersion(spark, dir, v - 1, queries, 5, 4)
    }
  }

  test("excludeSelfId=false: an external query whose id collides with a " +
      "stored vec_id still sees that stored vector") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ex").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 4, iters = 2)
    // query = stored vector 5 under its own id: with the self-search
    // convention it excludes itself; as an external query it must find
    // itself at sim 1.0, rank 1
    val q5 = emb.filter(col("vec_id") === 5)
    val self = IvfIndex.search(spark, dir, q5, k = 1, nprobe = 1)
    assert(!self.collect().exists(_.getLong(2) == 5L))
    val ext = IvfIndex.search(spark, dir, q5, k = 1, nprobe = 1,
      excludeSelfId = false).head()
    assert(ext.getLong(2) === 5L && ext.getDouble(3) === 1.0)
  }

  test("an empty append burns no index version and leaves no staging; " +
      "a filtered-out append FAILS loudly instead of losing vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ea").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 4, iters = 2)
    val v = IvfIndex.history(spark, dir).head
    IvfIndex.append(spark, dir, emb.filter(col("vec_id") < 0)) // truly empty
    assert(IvfIndex.history(spark, dir).head === v)
    // vectors of the WRONG dimension would be silently dropped by the
    // assignment filter — that is data loss, not an empty batch
    val wrongDim = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, dir, wrongDim)
    }
    assert(e.getMessage.contains("must not silently lose vectors"))
    assert(IvfIndex.history(spark, dir).head === v)
    val stagings = new java.io.File(s"$dir/data").listFiles().map(_.getName)
    assert(stagings.length === 1, s"no staging may survive: ${stagings.toSeq}")
  }

  test("tuneNprobe picks the minimal dial meeting the recall target, " +
      "and the choice generalizes to held-out queries") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_tn").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 8, iters = 3)
    val kc = IvfIndex.codebook(spark, dir).length
    // disjoint probe sample and held-out set, both drawn from the corpus
    val sample = emb.filter(col("vec_id") % 10 === 0)
    val heldOut = emb.filter(col("vec_id") % 10 === 5)
    val t = IvfIndex.tuneNprobe(spark, dir, sample, k = 5, targetRecall = 0.9)
    assert(t.nprobe >= 1 && t.nprobe <= kc)
    assert(t.recall >= 0.9, s"reported recall ${t.recall} below target")
    // minimality: one probe fewer misses the target (unless 1 suffices)
    if (t.nprobe > 1)
      assert(t.curve(t.nprobe - 2)._2 < 0.9,
        s"nprobe ${t.nprobe} not minimal: curve ${t.curve}")
    // the curve is a cumulative distribution: monotone, ends at 1.0
    assert(t.curve.map(_._2) === t.curve.map(_._2).sorted)
    assert(math.abs(t.curve.last._2 - 1.0) < 1e-12,
      "probe-all recall must be exactly 1 against its own truth")
    assert(t.scanFraction > 0.0 && t.scanFraction <= 1.0)
    // the curve's own claim, re-measured the expensive way: recall of a
    // REAL search at the chosen nprobe vs probe-all, on the sample...
    def recallOf(queries: org.apache.spark.sql.DataFrame, np: Int): Double = {
      val got = IvfIndex.search(spark, dir, queries, 5, np)
        .select(col("q_vec_id"), col("c_vec_id"))
      val truth = IvfIndex.search(spark, dir, queries, 5, kc)
        .select(col("q_vec_id"), col("c_vec_id"))
      got.intersect(truth).count().toDouble / truth.count()
    }
    val direct = recallOf(sample, t.nprobe)
    assert(math.abs(direct - t.recall) < 1e-12,
      s"one-pass curve ${t.recall} != direct measurement $direct")
    // ...and on HELD-OUT queries the tuned dial still meets the target
    // to sampling error (the margin convention of the approx family)
    assert(recallOf(heldOut, t.nprobe) >= 0.9 - 0.1,
      "held-out recall fell more than the sampling margin below target")
  }

  test("delete tombstones: vector vanishes from search/readVectors, " +
      "time travel to the pre-delete version still returns it, and a " +
      "replayed txn burns no version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_del").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 8, iters = 3)
    val n0 = IvfIndex.readVectors(spark, dir).count()
    val victimId = 7L
    val queries = emb.filter(col("vec_id") < 15)
    // victim is a self-neighbour at probe-all before the delete
    val kc = IvfIndex.codebook(spark, dir).length
    val before = IvfIndex.search(spark, dir, queries, k = 5, nprobe = kc,
      excludeSelfId = false)
    assert(before.filter(col("c_vec_id") === victimId).count() > 0)
    import spark.implicits._
    IvfIndex.delete(spark, dir, Seq(victimId).toDF("vec_id"),
      txn = Some(("deleter", 1L)))
    val vDel = IvfIndex.currentManifest(spark, dir).get.version
    // gone from every read of the current version
    val after = IvfIndex.search(spark, dir, queries, k = 5, nprobe = kc,
      excludeSelfId = false)
    assert(after.filter(col("c_vec_id") === victimId).count() === 0)
    assert(IvfIndex.readVectors(spark, dir).count() === n0 - 1)
    // time travel: the pre-delete version still serves it
    val old = IvfIndex.searchVersion(spark, dir, vDel - 1, queries, k = 5,
      nprobe = kc, excludeSelfId = false)
    assert(old.filter(col("c_vec_id") === victimId).count() > 0)
    // replayed delete txn: recognized, no version burned
    IvfIndex.delete(spark, dir, Seq(victimId).toDF("vec_id"),
      txn = Some(("deleter", 1L)))
    assert(IvfIndex.currentManifest(spark, dir).get.version === vDel)
    // empty batch: no version burned either
    IvfIndex.delete(spark, dir, emb.filter(lit(false)).select($"vec_id"))
    assert(IvfIndex.currentManifest(spark, dir).get.version === vDel)
  }

  test("compactIndex(reclaimDeletes) physically removes tombstoned rows " +
      "and drops the sidecars; results are unchanged; retrain also resets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rc").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 4, iters = 2)
    import spark.implicits._
    val victims = Seq(3L, 11L, 42L)
    IvfIndex.delete(spark, dir, victims.toDF("vec_id"))
    assert(IvfIndex.currentManifest(spark, dir).get.tombstones.nonEmpty)
    val queries = emb.filter(col("vec_id") < 15)
    val kc = IvfIndex.codebook(spark, dir).length
    val preCompact = pairs(IvfIndex.search(spark, dir, queries, k = 5,
      nprobe = kc, excludeSelfId = false))
    val rewritten = IvfIndex.compactIndex(spark, dir, maxFilesPerCid = 1000,
      reclaimDeletes = true)
    assert(rewritten.nonEmpty, "victim-holding cids must be rewritten")
    val m2 = IvfIndex.currentManifest(spark, dir).get
    assert(m2.tombstones.isEmpty, "sidecars must be dropped after reclaim")
    // physically gone: the RAW (un-tomb-filtered) read no longer has them
    val rawIds = m2.paths.values.flatten.toSeq.sorted
      .map(rel => spark.read.parquet(s"$dir/$rel").select(col("vec_id")))
      .reduce(_ unionAll _).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !rawIds.contains(v)))
    // search results identical before and after the physical reclaim
    val postCompact = pairs(IvfIndex.search(spark, dir, queries, k = 5,
      nprobe = kc, excludeSelfId = false))
    assert(postCompact === preCompact)
    // retrain path: delete again, retrain, sidecars reset + stays gone
    IvfIndex.delete(spark, dir, Seq(5L).toDF("vec_id"))
    IvfIndex.retrain(spark, dir, k = 4, iters = 2)
    val m3 = IvfIndex.currentManifest(spark, dir).get
    assert(m3.tombstones.isEmpty)
    assert(IvfIndex.readVectors(spark, dir)
      .filter(col("vec_id") === 5L).count() === 0)
  }

  test("search reads ONLY the probed cid partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_pr").toString + "/idx"
    IvfIndex.build(emb, dir, dim = 64, k = 8, iters = 3)
    val oneQuery = emb.filter(col("vec_id") === 3)
    val res = IvfIndex.search(spark, dir, oneQuery, k = 3, nprobe = 2)
    assert(res.count() > 0)
    // the corpus side of search goes through the manifest-pruned read:
    // only the probed cids' partition directories are ever listed/read
    val m = IvfIndex.currentManifest(spark, dir).get
    val q = Knn.ivfAssign(Knn.withNorm(oneQuery, "embedding"), m.centroids, 2)
    val probed = q.select(col("cid")).distinct().collect().map(_.getInt(0)).toSet
    assert(probed.size <= 2)
    val touched = IvfIndex.readVectors(spark, dir, Some(probed))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .map(f => f.substring(0, f.lastIndexOf('/'))).distinct
    assert(touched.length <= probed.size,
      s"probing ${probed.size} cids must touch <= ${probed.size} dirs")
    assert(touched.forall(_.matches(".*/cid=\\d+")) &&
      touched.map(_.split("cid=").last.toInt).toSet.subsetOf(probed),
      s"read dirs ${touched.toSeq} must lie inside probed cids $probed")
  }
}
