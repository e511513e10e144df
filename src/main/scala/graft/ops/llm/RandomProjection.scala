package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Signed random projection — the dimensionality-reduction rung of the
  * embedding pipeline (Achlioptas 2003: ±1 entries preserve pairwise
  * distances in expectation like Gaussian projections; the same family
  * SimHash draws its hyperplanes from). 64-d corpus vectors project to
  * 8 components through a deterministic ±1 matrix derived from md5
  * (PARITY rule 19 — never rand(), so the projection is reproducible
  * across runs, engines, and scale factors, and an incremental job
  * projects new rows identically to old ones).
  *
  * Engine-exactness, the q_llm_rproj design: the sign matrix is
  * computed ONCE driver-side (512 doubles — the codebook class of
  * bounded driver state, broadcast as column literals) with the same
  * md5 formula the oracle CTE evaluates per cell; each component is a
  * SEQUENTIAL left fold `aggregate(zip_with(v, signs_j, *), 0, +)`
  * matching DuckDB's `list_reduce(list_prepend(0.0, …))` term for
  * term (PARITY rule 7), so the result is BIT-IDENTICAL — no rounding
  * tolerance anywhere. Scale shape: a narrow per-row map, no shuffle,
  * no per-row hashing (the matrix literal replaces 512 md5 calls per
  * row); at 100 TB this is a map-only pass exactly like quantization.
  */
object RandomProjection {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** ±1.0 sign for matrix cell (i, j): +1 iff the first hex digit of
    * md5("rp:i:j") is below '8' — the same rule the oracle's CTE
    * evaluates with DuckDB's md5. */
  def sign(i: Int, j: Int): Double =
    if (md5hex(s"rp:$i:$j").charAt(0) < '8') 1.0 else -1.0

  /** Project `vecCol` (array of numerics, dimension `dim`) to `k`
    * components appended as an array column `outCol`. */
  def project(df: DataFrame, vecCol: String, dim: Int, k: Int,
              outCol: String = "proj"): DataFrame = {
    require(dim >= 1 && k >= 1, s"dim and k must be >= 1, got $dim, $k")
    val comps = (0 until k).map { j =>
      val sj = typedLit((0 until dim).map(i => sign(i, j)))
      aggregate(
        zip_with(col(vecCol), sj, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, t) => acc + t)
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Oracled projection: every corpus embedding's 8 components,
    * bit-exact cross-engine (no rounding — a mismatch would be a real
    * arithmetic divergence, not noise). */
  def qLlmRproj(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    project(Tables.table(spark, dir, "embeddings")
        .select($"vec_id", $"embedding"), "embedding", dim = 64, k = 8)
      .select($"vec_id", posexplode($"proj").as(Seq("j", "comp")))
      .orderBy($"vec_id", $"j")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_rproj" -> (qLlmRproj _)
  )

  val oracle: Map[String, String] = Map(
    // the oracle derives the SAME matrix per-cell from md5 in a CTE,
    // then folds each component in the identical sequential order
    // (list_prepend 0.0 + list_reduce == Spark aggregate's left fold)
    "q_llm_rproj" ->
      """WITH m AS (
        |  SELECT i.range AS i, j.range AS j,
        |    CASE WHEN substring(md5('rp:' || i.range || ':' || j.range),
        |                        1, 1) < '8'
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(64) i, range(8) j),
        |signs AS (
        |  SELECT j, list(s ORDER BY i) AS sj FROM m GROUP BY j)
        |SELECT vec_id, j,
        |  list_reduce(list_prepend(0.0,
        |    list_apply(range(1, 65), i -> embedding[i]::DOUBLE * sj[i])),
        |    (a, b) -> a + b) AS comp
        |FROM embeddings, signs
        |ORDER BY vec_id, j""".stripMargin
  )
}
