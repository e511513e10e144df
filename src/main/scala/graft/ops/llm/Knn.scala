package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (§2-K).
  *
  * Two paths:
  * - bruteForceTopK: exact cosine top-k, query-set broadcast against
  *   the corpus. Correctness baseline; cost O(|Q|·|C|·dim) — fine for
  *   a bounded query set, never for corpus×corpus.
  * - bucketedTopK: IVF-style blocked search — both sides are assigned
  *   a coarse bucket (here: the `label` column standing in for a
  *   nearest-centroid assignment; with real centroids the assignment
  *   would be argmin over a broadcast centroid table) and only
  *   same-bucket pairs are scored. One shuffle on the bucket key, per-
  *   bucket quadratic → this is the 100 TB shape: recall trades off
  *   against nprobe (bucket fan-out), never a full cross join.
  *
  * All arithmetic widens float32 → double first (engine parity — the
  * DuckDB oracle does the same; see FIXTURES.md §2).
  */
object Knn {

  /** Dot product via zip_with + left-fold aggregate — deterministic
    * accumulation order (matches the oracle's list_reduce fold). The
    * reference formulation; hot paths use the native codegen
    * DotProduct expression (bit-identical, ~13× faster — MicroBench). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native-codegen dot (graft.functions.DotProduct); same ascending
    * left fold as `dot`, so results are bit-identical. Requires
    * VectorExpressions.register — public entry points below do it. */
  def dotNative(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_native(a, b)

  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Attach `v` (double vector) and `nrm` columns (native kernel),
    * EXCLUDING zero-norm vectors: their cosine is 0/0 = NaN, and Spark
    * orders NaN above every real number, so one degenerate vector
    * would otherwise rank as the top neighbour of every query in
    * every ranking path (brute force, bucketed, IVF, LSH alike). */
  def withNorm(df: DataFrame, embCol: String): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("v", asDouble(col(embCol)))
      .withColumn("nrm", sqrt(dotNative(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
  }

  /** Exact top-k cosine neighbours of each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "embedding")
      .select(col("vec_id").as("q_vec_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = withNorm(corpus, "embedding")
      .select(col("vec_id").as("c_vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("sim", dotNative(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("sim").desc, col("c_vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Random-hyperplane LSH signature: bit i = sign(v · plane_i) with
    * seeded deterministic hyperplanes. Cosine-similar vectors agree on
    * most bits (P[bit match] = 1 - angle/π), so bucketing on bit-bands
    * finds cosine near-duplicates without an all-pairs join — the
    * embedding analog of MinHash banding.
    *
    * Uses the native codegen dot kernel: this runs nPlanes dots PER ROW
    * on the candidate-generation hot path, so the interpreted HOF cost
    * multiplies by nPlanes. Sign is threshold-compared, so HOF-vs-
    * native bit-identity (same left fold) keeps signatures unchanged.
    * Requires VectorExpressions.register (callers go through withNorm,
    * which registers). */
  def hyperplaneSignature(v: Column, dim: Int, nPlanes: Int,
                          seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    (0 until nPlanes).map { p =>
      val plane = typedLit(planes(p).toSeq)
      when(dotNative(v, plane) > 0.0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Cosine near-duplicate pairs via hyperplane-LSH banding: bucket on
    * `bands` disjoint bit-bands of the signature, score only bucket
    * collisions, keep pairs with verified cosine >= threshold. */
  def cosineNearDups(corpus: DataFrame, dim: Int, threshold: Double,
                     nPlanes: Int = 16, bands: Int = 4): DataFrame = {
    require(nPlanes % bands == 0, s"nPlanes=$nPlanes not divisible by bands=$bands")
    val bitsPerBand = nPlanes / bands
    val mask = (1L << bitsPerBand) - 1
    val sig = withNorm(corpus, "embedding")
      // vectors whose length != dim would dot to NULL against every
      // plane → all-zero signatures → one mega-bucket → the O(n²)
      // join this function exists to avoid; exclude them explicitly
      .filter(size(col("v")) === dim)
      .withColumn("sig", hyperplaneSignature(col("v"), dim, nPlanes))
    val banded = sig.select(col("vec_id"), col("v"), col("nrm"),
      explode(array((0 until bands).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sig"), i * bitsPerBand).bitwiseAND(mask).as("bh"))): _*))
        .as("bb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = banded.select(col("band"), col("bh"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = banded.select(col("band"), col("bh"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotNative(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** Cosine near-duplicate pairs within a PRE-EXISTING bucket column —
    * the deterministic (and therefore ORACLED) embedding near-dup
    * path, where [[cosineNearDups]]' seeded hyperplane banding is the
    * self-bucketing variant. Same blocked shape: ONE shuffle on the
    * bucket key, pairs only inside a block, never all-pairs. */
  def bucketedNearDups(corpus: DataFrame, bucketCol: String,
                       threshold: Double): DataFrame = {
    val n = withNorm(corpus, "embedding")
    val a = n.select(col(bucketCol).as("bk"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col(bucketCol).as("bk"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", dotNative(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  // ---------------------------------------------------------------------
  // Real IVF: spherical k-means coarse quantizer + nprobe search.
  // bucketedTopK below blocks on a PRE-EXISTING bucket column; these
  // build the buckets from the data itself — the production IVF shape.
  // ---------------------------------------------------------------------

  /** Spherical k-means centroids via Lloyd's iterations, DataFrame ops
    * only. Deterministic: init = first k vectors by xxhash64(vec_id)
    * order (a seeded pseudo-random sample), ties in assignment break
    * by centroid id. Per iteration: one broadcast-crossJoin assign (no
    * corpus shuffle beyond the k×dim agg) + one element-wise mean.
    * Centroids (k×dim doubles) collect to the driver each iteration —
    * bounded by the codebook size, never by the corpus; that codebook
    * IS driver state, exactly like every IVF index build. */
  def ivfCentroids(corpus: DataFrame, dim: Int, k: Int, iters: Int = 5,
                   seed: Long = 42L): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val unit = withNorm(corpus, "embedding")
      .filter(size(col("v")) === dim && col("nrm") > 0.0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
      .persist()
    try {
      var centroids: Array[Array[Double]] = unit
        .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
        .limit(k).select(col("u")).collect()
        .map(_.getSeq[Double](0).toArray)
      var it = 0
      while (it < iters) {
        val cdf = centroidDf(spark, centroids)
        // argmax via max(struct(sim, -cid)): lexicographic struct max ==
        // (sim desc, cid asc) — same tie-break as a window, but it
        // partial-aggregates map-side instead of shuffling the k-fold
        // crossJoin output into a per-vector sort
        val assigned = unit.crossJoin(broadcast(cdf))
          .withColumn("sim", dotNative(col("u"), col("cv")))
          .groupBy(col("vec_id"))
          .agg(argmaxCid(col("sim")), first(col("u")).as("u"))
          .select((-col("b.ncid")).as("cid"), col("u"))
        val means = assigned
          .select(col("cid"), posexplode(col("u")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("mean"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        centroids = centroids.indices.map { i =>
          means.get(i).map { m =>
            val n = math.sqrt(m.map(x => x * x).sum)
            if (n > 0) m.map(_ / n) else centroids(i) // empty/degenerate: keep
          }.getOrElse(centroids(i))
        }.toArray
        it += 1
      }
      centroids
    } finally { unit.unpersist(); () }
  }

  /** Centroid codebook as a broadcast-sized DataFrame — the ONE
    * encoding shared by codebook build and search (a divergence here
    * would silently split assignment between the two). */
  private def centroidDf(spark: org.apache.spark.sql.SparkSession,
                         centroids: Array[Array[Double]]): DataFrame =
    spark.createDataFrame(
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("cid", "cv")

  /** Shared argmax aggregate: max(struct(score, -cid)) == (score desc,
    * cid asc) — the single tie-break rule for every assignment. */
  private def argmaxCid(score: Column): Column =
    max(struct(score, (-col("cid")).as("ncid"))).as("b")

  /** Assign each vector to its `nprobe` nearest centroids (by cosine;
    * ties break by centroid id). Returns (vec_id, v, nrm, cid).
    * Zero-norm vectors are EXCLUDED up front: their cosine is 0/0 =
    * NaN, which Spark orders above every real number — without the
    * filter a degenerate vector wins every ranking it appears in
    * (ivfCentroids applies the same guard). nprobe=1 — the corpus-side
    * hot path — is an argmax aggregation (map-side partial, no
    * per-vector sort); nprobe>1 (bounded query sets) takes the window. */
  def ivfAssign(df: DataFrame, centroids: Array[Array[Double]],
                nprobe: Int): DataFrame = {
    val spark = df.sparkSession
    val scored = df.select(col("vec_id"), col("v"), col("nrm"))
      .filter(col("nrm") > 0.0)
      .crossJoin(broadcast(centroidDf(spark, centroids)))
      .withColumn("csim", dotNative(col("v"), col("cv")) / col("nrm"))
    if (nprobe == 1)
      scored.groupBy(col("vec_id"))
        .agg(argmaxCid(col("csim")),
          first(col("v")).as("v"), first(col("nrm")).as("nrm"))
        .select(col("vec_id"), col("v"), col("nrm"), (-col("b.ncid")).as("cid"))
    else {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      scored.withColumn("crn", row_number().over(w))
        .filter(col("crn") <= nprobe)
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    }
  }

  /** Full per-query probe ORDER: (vec_id, cid, crn) with crn = 1 for
    * the nearest centroid through |codebook| for the farthest — the
    * same (csim desc, cid asc) total order [[ivfAssign]] truncates.
    * The observable the nprobe recall tuner integrates over: a stored
    * neighbour becomes visible to a query exactly when nprobe reaches
    * the crn of the neighbour's home cell. Input must carry (vec_id,
    * v, nrm) — i.e. already through [[withNorm]]. */
  def ivfProbeRanks(df: DataFrame,
                    centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    df.select(col("vec_id"), col("v"), col("nrm"))
      .filter(col("nrm") > 0.0)
      .crossJoin(broadcast(centroidDf(spark, centroids)))
      .withColumn("csim", dotNative(col("v"), col("cv")) / col("nrm"))
      .select(col("vec_id"), col("cid"), row_number().over(w).as("crn"))
  }

  /** IVF top-k: corpus vectors live in their single nearest-centroid
    * bucket; each query probes its `nprobe` nearest buckets and takes
    * the exact top-k over everything it saw. ONE shuffle on the bucket
    * key; per-bucket exact scoring; recall rises with nprobe and
    * reaches brute force EXACTLY at nprobe = centroids.length (every
    * bucket probed — the invariant the spec asserts; note that is the
    * CODEBOOK size, unrelated to the top-k parameter `k`). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    val q = ivfAssign(withNorm(queries, "embedding"), centroids, nprobe)
      .select(col("vec_id").as("q_vec_id"), col("cid").as("__bkt"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = ivfAssign(withNorm(corpus, "embedding"), centroids, nprobe = 1)
      .select(col("vec_id").as("c_vec_id"), col("cid").as("__bkt"),
        col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.join(q, "__bkt")
      .filter(col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("sim", dotNative(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("sim").desc, col("c_vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Blocked ANN: score only pairs sharing a coarse bucket. Recall is
    * exact for neighbours in the same bucket; cross-bucket neighbours
    * are missed by design (raise nprobe / refine buckets to trade). */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, bucketCol: String,
                   k: Int): DataFrame = {
    val q = withNorm(queries, "embedding")
      .select(col("vec_id").as("q_vec_id"), col(bucketCol).as("__bkt"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = withNorm(corpus, "embedding")
      .select(col("vec_id").as("c_vec_id"), col(bucketCol).as("__bkt"),
        col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.join(q, "__bkt")
      .filter(col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("sim", dotNative(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("sim").desc, col("c_vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
        round(col("sim"), 4).as("sim"))
  }
}
