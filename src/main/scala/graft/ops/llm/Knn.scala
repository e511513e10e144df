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
    * accumulation order (matches the oracle's list_reduce fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Attach `v` (double vector) and `nrm` columns. */
  def withNorm(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("v", asDouble(col(embCol)))
      .withColumn("nrm", l2norm(col("v")))

  /** Exact top-k cosine neighbours of each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "embedding")
      .select(col("vec_id").as("q_vec_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = withNorm(corpus, "embedding")
      .select(col("vec_id").as("c_vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_vec_id") =!= col("c_vec_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
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
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("sim").desc, col("c_vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_vec_id"), col("rn"), col("c_vec_id"),
        round(col("sim"), 4).as("sim"))
  }
}
