package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Random projection beyond the oracled key: the JL distance-
  * preservation property actually holds on the corpus, and the sign
  * matrix is balanced and deterministic. */
class RandomProjectionSpec extends SparkSpec {

  test("sign matrix: deterministic, ±1-valued, roughly balanced") {
    val signs = for (j <- 0 until 8; i <- 0 until 64)
      yield RandomProjection.sign(i, j)
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    // md5 is uniform: expect ~50% positive; 3-sigma band for n=512
    val pos = signs.count(_ == 1.0)
    assert(pos > 512 / 2 - 3 * 12 && pos < 512 / 2 + 3 * 12,
      s"sign balance suspicious: $pos/512 positive")
    // deterministic across calls
    assert(RandomProjection.sign(7, 3) === RandomProjection.sign(7, 3))
  }

  test("JL property: projected dot/norm correlates with the original " +
      "(scaled by dim ratio) on real corpus pairs") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(100)
    val proj = RandomProjection.project(emb, "embedding", 64, 8)
    // E[||proj||^2] = k/“per-component variance” · ||v||^2 with ±1
    // entries: E[p_j^2] = ||v||^2, so E[||p||^2] = k·||v||^2. Check
    // the AVERAGE ratio over 100 vectors lands near k=8 (law of large
    // numbers band, generous ±50%).
    val r = proj.select(
        aggregate(transform($"embedding", x => x.cast("double") * x),
          lit(0.0), (a, b) => a + b).as("n2"),
        aggregate(transform($"proj", p => p * p),
          lit(0.0), (a, b) => a + b).as("p2"))
      .agg(avg($"p2" / $"n2")).head().getDouble(0)
    assert(r > 4.0 && r < 12.0,
      s"E[||proj||^2 / ||v||^2] should be near k=8, got $r")
  }
}
