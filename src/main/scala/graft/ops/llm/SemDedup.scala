package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semantic (embedding-cluster) deduplication — the SemDeDup pass
  * (Abbas et al. 2023): assign every embedding to its nearest coarse
  * centroid, compare pairs only WITHIN a cluster, and when a pair's
  * cosine clears the threshold keep the member with the LOWER
  * similarity to the cluster centroid (the paper's diversity-keeping
  * rule; ties break to the smaller id). This is the dedup rung the
  * exact/MinHash/SimHash/n-gram/edit-distance family cannot reach:
  * paraphrases share no tokens, but their embeddings cluster.
  *
  * Pure composition of existing primitives: the [[Knn]] codebook
  * assignment (broadcast centroids, map-side argmax — no corpus
  * shuffle beyond the per-id aggregation) and the
  * [[Knn.bucketedNearDups]] pair shape (ONE shuffle on the cluster
  * id, per-cluster quadratic, never all-pairs). At 100 TB the
  * centroid count is the dial that bounds per-cluster pair volume —
  * exactly the IVF argument; the drop rule is pairwise (the published
  * greedy form), so no iterative component propagation is needed.
  */
object SemDedup {

  /** Per-vector SemDeDup report: (idCol, cid, cent_sim, kept).
    * `kept` is false iff some same-cluster partner with pair-cosine
    * >= threshold ranks ahead of this vector in (cent_sim asc, id
    * asc) order — i.e. the partner is the more-diverse survivor.
    * Zero-norm vectors are excluded (cosine is undefined for them —
    * the [[Knn.withNorm]] rule). */
  def report(corpus: DataFrame, idCol: String, embCol: String,
             centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    val cdf = spark.createDataFrame(
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) })
      .toDF("cid", "cv")
    // nearest centroid via the map-side argmax (Knn.ivfAssign's
    // nprobe=1 form), keeping the winning centroid-similarity: the
    // lexicographic max(struct(csim, -cid)) == (csim desc, cid asc)
    val assigned = Knn.withNorm(corpus.select(col(idCol), col(embCol)), embCol)
      .crossJoin(broadcast(cdf))
      .withColumn("csim", Knn.dotNative(col("v"), col("cv")) / col("nrm"))
      .groupBy(col(idCol))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("b"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col(idCol), col("v"), col("nrm"),
        (-col("b.ncid")).as("cid"), col("b.csim").as("csim"))
      // the assignment materializes ONCE: both arms of the
      // within-cluster self-join and the final report read it — the
      // same state an IVF index build persists anyway; without the
      // checkpoint the centroid argmax re-runs over the corpus three
      // times in one plan (r14 multi-scan audit)
      .localCheckpoint()
    val a = assigned.select(col("cid"), col(idCol).as("__id_a"),
      col("v").as("va"), col("nrm").as("na"), col("csim").as("ca"))
    val b = assigned.select(col("cid"), col(idCol).as("__id_b"),
      col("v").as("vb"), col("nrm").as("nb"), col("csim").as("cb"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("__id_a") =!= col("__id_b"))
      .withColumn("sim", Knn.dotNative(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .filter(col("ca") < col("cb") ||
        (col("ca") === col("cb") && col("__id_a") < col("__id_b")))
      .select(col("__id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cid").cast("long").as("cid"),
        round(col("csim"), 4).as("cent_sim"),
        col("__dropped").isNull.as("kept"))
  }

  /** Surviving rows of `corpus` under the SemDeDup rule (all original
    * columns). Zero-norm vectors drop with the duplicates — they have
    * no defined similarity to anything. */
  def semDedup(corpus: DataFrame, idCol: String, embCol: String,
               centroids: Array[Array[Double]], threshold: Double): DataFrame =
    corpus.join(
      report(corpus, idCol, embCol, centroids, threshold)
        .filter(col("kept")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Oracled SemDeDup over embeddings ∪ 20 planted perturbed twins
    * (v + 0.05 element-wise in double space, ids above max(vec_id) —
    * the q_llm_cosine_neardup planting). Fixed inlined 4-centroid
    * codebook (the q_llm_ivf fixture). Probed at sf0.01: all 20 twins
    * co-cluster with their source at sim >= 0.9174 while the densest
    * organic within-cluster pair reaches 0.4749 — a 0.44 margin to
    * the 0.9 threshold, so exactly the 20 planted twins must drop. */
  def qLlmSemdedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Array.tabulate(4, 64)((i, j) => if (j % 4 == i) 1.0 else 0.1)
    val base = Tables.table(spark, dir, "embeddings")
      .select($"vec_id", Knn.asDouble($"embedding").as("embedding"))
      // one embeddings scan: max-id, twin planting and the report all
      // derive from the materialized double-converted frame
      .localCheckpoint()
    val mx = base.agg(max($"vec_id").as("mx"))
    val planted = base.filter($"vec_id" < 20).crossJoin(broadcast(mx))
      .select(($"vec_id" + $"mx" + 1).as("vec_id"),
        transform($"embedding", x => x + lit(0.05)).as("embedding"))
    report(base.unionByName(planted), "vec_id", "embedding", cents, 0.9)
      .orderBy($"vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_semdedup" -> (qLlmSemdedup _)
  )

  private val dotFold =
    "list_reduce(list_prepend(0.0, list_apply(range(1, len(%s) + 1), i -> %s[i] * %s[i])), (acc, x) -> acc + x)"

  private def fold(a: String, b: String) = dotFold.format(a, a, b)

  val oracle: Map[String, String] = Map(
    "q_llm_semdedup" ->
      s"""WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |planted AS (
        |  SELECT vec_id + (SELECT max(vec_id) FROM base) + 1 AS vec_id,
        |    list_transform(v, x -> x + 0.05) AS v
        |  FROM base WHERE vec_id < 20),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |n AS (
        |  SELECT vec_id, v, sqrt(${fold("v", "v")}) AS nrm FROM u),
        |nn AS (SELECT * FROM n WHERE nrm > 0),
        |cents AS (
        |  SELECT i::INT AS cid,
        |    list_transform(range(1, 65),
        |      j -> CASE WHEN (j - 1) % 4 = i THEN 1.0 ELSE 0.1 END) AS cv
        |  FROM range(4) t(i)),
        |assign AS (
        |  SELECT vec_id, v, nrm, cid, ${fold("v", "cv")} / nrm AS csim
        |  FROM nn CROSS JOIN cents
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY
        |    ${fold("v", "cv")} / nrm DESC, cid ASC) = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assign a JOIN assign b
        |    ON a.cid = b.cid AND a.vec_id != b.vec_id
        |  WHERE ${fold("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.9
        |    AND (a.csim < b.csim
        |      OR (a.csim = b.csim AND a.vec_id < b.vec_id)))
        |SELECT s.vec_id, s.cid::BIGINT AS cid, round(s.csim, 4) AS cent_sim,
        |  (d.vec_id IS NULL) AS kept
        |FROM assign s LEFT JOIN dropped d USING (vec_id)
        |ORDER BY s.vec_id""".stripMargin
  )
}
